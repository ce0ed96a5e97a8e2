"""Validates the committed schedule-scale convergence artifact
(data/convergence/blobs_convergence.json, produced by
scripts/convergence_run.py): a hermetic 3.6k-step occ-sampler run on the
procedural blobs scene crossing BOTH grid upsamples (128^3 -> 256^3 ->
512^3 N_voxel equivalents) with optimizer resets, occ-loss / radiance /
alpha-mask phases — the stand-in for compressor/teapot until real
datasets exist (VERDICT r3 item 5)."""
import json
import os

import numpy as np

ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'data', 'convergence',
    'blobs_convergence.json')


def test_convergence_trajectory_bounds():
    with open(ART) as f:
        t = json.load(f)
    meta = t['meta']
    assert meta['upsample_list'] == [1200, 2400]
    assert meta['phases']['occ_loss_on'] == 1500
    marks = t['chamfer']
    assert [m['step'] for m in marks] == [600, 1200, 1800, 2400, 3000,
                                          3600]
    # both upsample boundaries were actually crossed
    grids = [m['grid'][0] for m in marks]
    assert grids[0] < 200 and 200 < grids[3] < 400 and grids[-1] > 400, \
        grids
    # geometry improves through the schedule: final Chamfer beats the
    # first checkpoint by >=20% and is the best of the run's tail
    chams = [m['chamfer'] for m in marks]
    assert np.isfinite(chams).all(), chams
    assert chams[-1] < 0.8 * chams[0], chams
    assert chams[-1] == min(chams), chams
    # rendering stays converged after warmup (val on held-out views)
    vals = [m['val_psnr'] for m in marks]
    assert min(vals) > 18.0, vals
    assert max(vals) > 23.0, vals
    # per-step logs cover the whole run and the losses stayed finite
    steps = t['steps']
    assert steps[-1]['step'] == 3600
    assert all(np.isfinite(r['loss']) for r in steps)
    # occ loss became active on schedule
    occ_rows = [r for r in steps if r['step'] > 1600 and 'loss_occ' in r]
    assert occ_rows, 'occ-loss phase never appeared in logs'


MAT_ART = os.path.join(os.path.dirname(ART),
                       'toy_material_convergence.json')


def test_material_convergence_trajectory_bounds():
    """Stage-2 schedule-scale artifact (scripts/convergence_mat.py):
    1500 material steps on the hermetic toy sphere through the full NIS
    schedule (flow warmup -> sampling on at step 300 -> frozen-copy
    refresh cadence).  PSNR must converge; the per-sample estimator
    variance is NOT asserted monotone — it scales with the learned
    light's contrast (jnp.var of fx/p, mc_shading.py), so it rises as
    the env light sharpens even while sampling improves."""
    with open(MAT_ART) as f:
        t = json.load(f)
    assert t['mat_steps'] == 1500 and t['nis_start_iter'] == 300
    traj = t['trajectory']
    steps = [m['step'] for m in traj]
    assert steps[-1] == 1500 and len(traj) >= 20
    ps = [m['psnr'] for m in traj]
    vs = [m['variance'] for m in traj]
    assert np.isfinite(ps).all() and np.isfinite(vs).all()
    # stage-1 geometry converged before baking
    assert t['stage1_psnr'][1] > t['stage1_psnr'][0] + 5.0
    # material stage converges and stays converged THROUGH the NIS
    # phase flips (sampling on, copy refreshes each update interval)
    first = np.mean(ps[:3])
    tail = np.mean(ps[-5:])
    assert tail > first + 4.0, (first, tail)
    assert max(ps) > 20.0, max(ps)
    # no post-NIS collapse: the worst post-NIS psnr stays above the
    # pre-NIS start
    post = [p for s, p in zip(steps, ps) if s > 300]
    assert min(post) > first, (first, min(post))


AB_ART = os.path.join(os.path.dirname(ART), 'toy_material_ab.json')


def test_material_ab_nis_and_budget_bounds():
    """Controlled A/B artifact (scripts/ab_material.py): three stage-2
    arms from one geometry/seed, differing in exactly one switch.

    (1) NIS A/B — the paper's core claim: with the flows sampling, the
        per-sample estimator variance at matched steps/config drops
        (measured tail means 0.0335 vs 0.0457, a ~27% reduction) and
        converged PSNR does not regress.
    (2) budgeted-vs-dense trace A/B — the quality question behind the
        0.988 ray-level agreement: converged PSNR and the recovered
        material maps match between the production budgeted trace and
        the dense full-fidelity trace."""
    with open(AB_ART) as f:
        t = json.load(f)
    arms = t['arms']

    def tail_mean(name, key):
        tr = arms[name]['trajectory']
        vals = [m[key] for m in tr if m['step'] >= 600]
        assert len(vals) >= 5
        return float(np.mean(vals))

    # all arms converge
    for name, arm in arms.items():
        assert arm['val_psnr'] > 18.0, (name, arm['val_psnr'])

    # (1) NIS variance reduction at matched budgeted config
    v_on = tail_mean('budgeted_nis', 'variance')
    v_off = tail_mean('budgeted_nis_off', 'variance')
    assert np.isfinite(v_on) and np.isfinite(v_off)
    assert v_on < 0.92 * v_off, (v_on, v_off)
    # and no PSNR cost for the variance win
    assert arms['budgeted_nis']['val_psnr'] > \
        arms['budgeted_nis_off']['val_psnr'] - 0.5

    # (2) budgeted trace matches dense on converged quality
    assert arms['budgeted_nis']['val_psnr'] > \
        arms['dense_nis']['val_psnr'] - 0.5
    deltas = t['material_map_mean_abs_delta']['budgeted_vs_dense']
    for k, v in deltas.items():
        assert v < 0.06, (k, v)
    # scale reference: the one-switch NIS arm moves the maps MORE than
    # the trace switch does (the budget is not the dominant error)
    nis_deltas = t['material_map_mean_abs_delta']['nis_vs_off']
    assert deltas['metallic'] < nis_deltas['metallic']
