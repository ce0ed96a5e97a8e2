"""Timing and profiling helpers.

TPU equivalents of the reference's CUDA-event ``Timing`` context manager
(ref: utils/base_utils.py:29-50):
  * ``Timing``: wall-clock block timer that synchronizes via
    ``block_until_ready`` on the provided arrays
  * ``profile_trace``: wraps ``jax.profiler.trace`` for on-demand device
    traces (open in TensorBoard / xprof)
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class Timing:
    """`with Timing('name', result_ref): ...` — prints elapsed ms after
    blocking on device work."""

    def __init__(self, name: str, enabled: bool = True):
        self.name = name
        self.enabled = enabled
        self._sync_targets = []

    def sync_on(self, *arrays):
        self._sync_targets.extend(arrays)
        return arrays[0] if len(arrays) == 1 else arrays

    def __enter__(self):
        if self.enabled:
            self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enabled:
            if self._sync_targets:
                jax.block_until_ready(self._sync_targets)
            dt = (time.perf_counter() - self.t0) * 1000
            print(f'[timing] {self.name}: {dt:.2f} ms', flush=True)
        return False


@contextlib.contextmanager
def profile_trace(logdir: str = '/tmp/tf_tpu_trace',
                  enabled: bool = True):
    """Device profiler trace (xprof/TensorBoard format)."""
    if not enabled:
        yield
        return
    with jax.profiler.trace(logdir):
        yield
    print(f'[profiler] trace written to {logdir}', flush=True)


class TrainLogger:
    """Append-only txt logs per split (ref: train/train_tools.py:93-108)."""

    def __init__(self, model_dir: str):
        import os
        os.makedirs(model_dir, exist_ok=True)
        self.model_dir = model_dir

    def log(self, results: dict, prefix: str = 'train', step: int = 0,
            verbose: bool = False):
        import os
        msg = f'step {step} ' + ' '.join(
            f'{k}={v:.5g}' if isinstance(v, float) else f'{k}={v}'
            for k, v in results.items())
        with open(os.path.join(self.model_dir, f'{prefix}.txt'), 'a') as f:
            f.write(msg + '\n')
        if verbose:
            print(msg, flush=True)
