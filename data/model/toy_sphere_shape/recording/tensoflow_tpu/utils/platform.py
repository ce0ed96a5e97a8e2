"""Platform selection for CLI entry points.

The container forces JAX_PLATFORMS=axon via sitecustomize (jax is imported
before user code), so an env var read at CLI start is the only reliable
switch: set TENSOFLOW_TPU_PLATFORM=cpu to run tools off the TPU.
"""
import os


def apply_platform_env():
    plat = os.environ.get('TENSOFLOW_TPU_PLATFORM')
    if plat:
        import jax
        jax.config.update('jax_platforms', plat)
