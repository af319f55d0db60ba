"""Quick TPU tunnel health probe: one small matmul, one 4096 calib.

Run standalone at session start (and between long measurement batches) to
check the relay/compile-helper pool is alive before committing to a long
measurement process. Prints JSON lines.
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.perf_counter()
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "init_s": round(time.perf_counter() - t0, 1)}), flush=True)

    # tiny matmul first: catches a wedged tunnel without a big compile
    a = jnp.asarray(np.random.randn(1024, 1024).astype(np.float32))
    t0 = time.perf_counter()
    r = float((a @ a)[0, 0])
    print(json.dumps({"matmul1024_ok": True, "s": round(time.perf_counter() - t0, 1)}), flush=True)

    # MXU calibration (bf16 4096) via fori_loop
    N = 4096
    b = jnp.asarray(np.random.randn(N, N).astype(np.float32)).astype(jnp.bfloat16)
    c = jnp.asarray(np.random.randn(N, N).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def run():
        def body(i, acc):
            return ((b + acc.astype(jnp.bfloat16) * 1e-12) @ c)[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, 50, body, jnp.float32(0))

    float(run())
    t0 = time.perf_counter()
    float(run())
    dt = (time.perf_counter() - t0) / 50
    print(json.dumps({"matmul4096_tflops": round(2 * N ** 3 / dt / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
