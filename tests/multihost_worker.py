"""Worker process for the multi-host smoke test (not collected by pytest).

Each worker owns 4 virtual CPU devices; two workers form an 8-device global
mesh via ``jax.distributed.initialize`` (exercising
``parallel.sharding.init_multihost`` — SURVEY §2.4 row 3). The worker runs
one replicated-params / sharded-batch grad step and checks the globally
all-reduced result against a local numpy oracle computed from the full batch.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    proc_id = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from tensoflow_tpu.parallel import sharding

    mesh = sharding.init_multihost(f"localhost:{port}", nproc, proc_id)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * 4, len(jax.devices())

    import numpy as np
    import jax.numpy as jnp

    n_global, d = 32, 8
    rng = np.random.RandomState(0)
    x = rng.randn(n_global, d).astype(np.float32)
    y = rng.randn(n_global, 1).astype(np.float32)
    w = rng.randn(d, 1).astype(np.float32)

    ds = sharding.data_sharding(mesh)
    rep = sharding.replicated(mesh)
    per = n_global // nproc
    lo = proc_id * per
    xg = jax.make_array_from_process_local_data(ds, x[lo:lo + per])
    yg = jax.make_array_from_process_local_data(ds, y[lo:lo + per])
    wg = jax.device_put(w, rep)

    @jax.jit
    def step(w, x, y):
        def loss_fn(w):
            return jnp.mean((x @ w - y) ** 2)
        return jax.value_and_grad(loss_fn)(w)

    loss, grad = step(wg, xg, yg)
    loss = float(loss)
    # grad is replicated: any addressable shard holds the full all-reduced
    # gradient (the cross-process psum XLA inserted for sharded-batch means)
    grad = np.asarray(grad.addressable_shards[0].data)

    resid = x @ w - y
    want_loss = float(np.mean(resid ** 2))
    want_grad = 2.0 * x.T @ resid / n_global
    assert abs(loss - want_loss) < 1e-5, (loss, want_loss)
    assert np.allclose(grad, want_grad, atol=1e-5), "grad mismatch"
    print(f"MULTIHOST_OK {proc_id} {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
