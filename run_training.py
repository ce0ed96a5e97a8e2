"""Training CLI (ref: run_training.py).

Usage:
  python run_training.py --cfg configs/shape/syn/compressor_occ.yaml \
      [key=value ...]

Stage is selected by the config's ``network`` field ('shape'|'material'),
like the reference's renderer registry (ref: network/invRenderer.py:4-7).
"""
from __future__ import annotations

import argparse
import os


def main():
    from tensoflow_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg', type=str, required=True)
    parser.add_argument('--steps', type=int, default=None,
                        help='limit number of steps (default: cfg total)')
    parser.add_argument('--mesh', action='store_true',
                        help='shard the ray batch over all visible devices '
                             '(1-D data mesh; params replicated, grads '
                             'all-reduced over ICI)')
    parser.add_argument('--multihost', type=str, default=None,
                        metavar='COORD_ADDR',
                        help='jax.distributed coordinator address '
                             '(host:port); implies --mesh over the global '
                             'device set')
    parser.add_argument('--num-processes', type=int, default=None)
    parser.add_argument('--process-id', type=int, default=None)
    parser.add_argument('overrides', nargs='*',
                        help='dotlist overrides key=value')
    args = parser.parse_args()

    mesh = None
    if args.mesh or args.multihost:
        # collective-overlap flags must land before the TPU runtime spins up
        os.environ.setdefault('LIBTPU_INIT_ARGS', '')
        from tensoflow_tpu.parallel import sharding
        if sharding.TPU_MULTICHIP_XLA_FLAGS not in \
                os.environ['LIBTPU_INIT_ARGS']:
            os.environ['LIBTPU_INIT_ARGS'] = (
                os.environ['LIBTPU_INIT_ARGS'] + ' '
                + sharding.TPU_MULTICHIP_XLA_FLAGS).strip()
        mesh = sharding.init_multihost(args.multihost, args.num_processes,
                                       args.process_id)
        print(f'[mesh] {mesh.devices.size} devices over '
              f'{mesh.axis_names}', flush=True)

    from tensoflow_tpu.config import load_config
    cfg = load_config(args.cfg, overrides=args.overrides)
    model_dir = os.path.join('data/model', cfg['name'])
    os.makedirs(model_dir, exist_ok=True)
    ckpt_path = os.path.join(model_dir, 'model.pkl')

    def log(info):
        print(' '.join(f'{k}={v:.5g}' if isinstance(v, float) else
                       f'{k}={v}' for k, v in info.items()), flush=True)

    # source snapshot for reproducibility (ref: trainer_inv.py:385-395)
    import shutil
    rec_dir = os.path.join(model_dir, 'recording')
    os.makedirs(rec_dir, exist_ok=True)
    try:
        shutil.copyfile(args.cfg, os.path.join(rec_dir, 'config.yaml'))
        pkg = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'tensoflow_tpu')
        dst = os.path.join(rec_dir, 'tensoflow_tpu')
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shutil.copytree(pkg, dst,
                        ignore=shutil.ignore_patterns('__pycache__',
                                                      'assets'))
    except OSError as e:
        print(f'[recording] skipped: {e}')

    if cfg.get('network', 'shape') == 'material' or cfg.get('isMaterial'):
        from tensoflow_tpu.train.trainer_mat import MaterialTrainer
        trainer = MaterialTrainer(cfg, cfg['geo_model_path'], mesh=mesh)
        if os.path.exists(ckpt_path) and not cfg['scratch']:
            trainer.load(ckpt_path)
        trainer.init_dataset()
    else:
        from tensoflow_tpu.train.trainer import ShapeTrainer
        trainer = ShapeTrainer(cfg, mesh=mesh)
        if os.path.exists(ckpt_path) and not cfg['scratch']:
            trainer.load(ckpt_path)
        trainer.init_dataset()

    total = args.steps if args.steps is not None else cfg['total_step']
    save_every = cfg['save_interval']
    val_every = cfg['val_interval']
    done = trainer.start_step
    while done < min(total, cfg['total_step']):
        n = min(save_every, total - done)
        trainer.train(n_steps=n, log_every=cfg['train_log_step'],
                      callback=log)
        done = trainer.start_step
        trainer.save(ckpt_path)
        if done % val_every < save_every:
            # full val split, best-ckpt selection on the split mean
            # (ref: trainer_inv.py:217-237); a val failure fails loudly
            psnr = trainer.validate()
            print(f'[val] step={done} psnr={psnr:.3f}', flush=True)
            if psnr > trainer.best_para:
                trainer.best_para = psnr
                trainer.save(os.path.join(model_dir, 'model_best.pkl'))
    print(f'training done at step {trainer.start_step}')


if __name__ == '__main__':
    main()
