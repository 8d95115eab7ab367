"""Environment check: devices, memory, kernel compilation
(reference analog: examples/check_npu_graph.py)."""

import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from minivllm_tpu.utils.device import describe_devices, get_backend, memory_info

    print("backend:", get_backend())
    for line in describe_devices():
        print(" ", line)
    info = memory_info()
    if info["bytes_limit"]:
        print(f"HBM: {info['bytes_limit'] / 2**30:.1f} GiB limit, "
              f"{(info['bytes_in_use'] or 0) / 2**30:.2f} GiB in use")

    t0 = time.perf_counter()
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    y = jax.jit(lambda a: a @ a)(x)
    jax.block_until_ready(y)
    print(f"matmul compile+run: {time.perf_counter() - t0:.2f}s")

    from minivllm_tpu.ops.pallas import decode_attention as pdec

    q = jnp.zeros((2, 4, 128), jnp.bfloat16)
    kc = jnp.zeros((64, 2, 128), jnp.bfloat16)
    print("pallas decode kernel supported:", pdec.is_supported(q, kc))


if __name__ == "__main__":
    main()
