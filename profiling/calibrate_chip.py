"""Absolute calibration of the v5e chip: HBM bw, VPU chains, MXU, loop
overhead — the roofline that production numbers are expressed against.

METHOD (round-4 rewrite): the axon relay adds a ~24 ms erratic round-trip
per call, so single-dispatch timings measure the tunnel, not the chip
(the round-3 version of this script did exactly that and was never
recorded). Every measurement here:
  * runs its op inside ONE on-device lax.fori_loop dispatch, carrying a
    data dependence so iterations cannot be collapsed;
  * is timed as a two-point slope, (time at 3k iters) - (time at k
    iters), which cancels dispatch/readback latency exactly;
  * feeds a varying scalar operand and forces a float() readback (the
    relay caches results by argument hash — CLAUDE.md timing traps).

Run on TPU: python profiling/calibrate_chip.py  [--json ROOFLINE.json]
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp


def slope(make_loop, iters: int, reps: int = 2):
    """Seconds per inner iteration via the (3k - k) two-point slope."""
    f = jax.jit(make_loop, static_argnames=("n",))
    float(f(jnp.float32(0.5), n=iters))          # compile+warm k
    float(f(jnp.float32(0.5), n=3 * iters))      # compile+warm 3k
    best = 1e9
    for r in range(reps + 2):
        if best < 1e9 and r >= reps:
            break
        s1 = jnp.float32(0.5 + 0.001 * r)
        t0 = time.time(); float(f(s1, n=iters)); t1 = time.time() - t0
        s2 = jnp.float32(0.7 + 0.001 * r)
        t0 = time.time(); float(f(s2, n=3 * iters)); t3 = time.time() - t0
        if t3 > t1:
            best = min(best, (t3 - t1) / (2 * iters))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    args = ap.parse_args()
    out = {"chip": str(jax.devices()[0]), "method": "on-device fori slope"}
    key = jax.random.PRNGKey(0)

    # 1. HBM bandwidth: axpy over 32M f32 (read 2 x 128 MB + write 128 MB)
    M = 1 << 25
    x = jax.random.normal(key, (M,), jnp.float32)
    y = jax.random.normal(key, (M,), jnp.float32)

    def bw_loop(s, n):
        def body(i, c):
            return c * 0.0 + (x * (s + i * 1e-9) + y)
        return jax.lax.fori_loop(0, n, body, x).sum()

    t = slope(lambda s, n: bw_loop(s, n), 40)
    out["hbm_axpy_GBps"] = round(3 * 4 * M / t / 1e9, 1)
    print(f"HBM axpy 32M: {t*1e3:.3f} ms/iter -> {out['hbm_axpy_GBps']} GB/s (2R+1W)")

    # 2. VPU fma chain at the production widths
    for N, tag in ((262144, "262k"), (2048, "2k")):
        xs = jax.random.normal(key, (N,), jnp.float32) + 2.0

        def fma_loop(s, n):
            # select+fma pair: the compare/select blocks XLA's algebraic
            # collapse of a pure c*k+b chain into one op
            def body(i, c):
                for _ in range(10):
                    c = c * 1.0001 + s
                    c = jnp.where(c > 1e3, c * 1e-3, c)
                return c
            return jax.lax.fori_loop(0, n, body, xs).sum()

        t = slope(fma_loop, 200) / 30  # ~3 VPU ops per pair
        out[f"vpu_fma_lanes_per_s_{tag}"] = round(N / t / 1e9, 2)
        print(f"VPU fma [{tag}]: {t*1e9:.1f} ns/op -> {N/t/1e9:.2f} G lanes/s")

    # 3. transcendental (rsqrt) chain
    xs = jax.random.normal(key, (262144,), jnp.float32) ** 2 + 1.1

    def rsqrt_loop(s, n):
        def body(i, c):
            for _ in range(10):
                c = jax.lax.rsqrt(c + 1.1) + s
            return c
        return jax.lax.fori_loop(0, n, body, xs).sum()

    t = slope(rsqrt_loop, 400) / 10
    out["vpu_rsqrt_lanes_per_s_262k"] = round(262144 / t / 1e9, 2)
    print(f"VPU rsqrt [262k]: {t*1e9:.1f} ns/op -> {262144/t/1e9:.2f} G lanes/s")

    # 4. MXU: bf16 matmul 2048^3 per iteration
    a = jax.random.normal(key, (2048, 2048), jnp.bfloat16)
    b = jax.random.normal(key, (2048, 2048), jnp.bfloat16)

    def mm_loop(s, n):
        def body(i, c):
            # carry c THROUGH the matmul: scalar*matmul would otherwise
            # be hoisted to one matmul + per-iter scaling
            return ((c @ b) * 1e-3 + a * s).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, a).astype(jnp.float32).sum()

    t = slope(mm_loop, 20)
    out["mxu_bf16_TFLOPs"] = round(2 * 2048**3 / t / 1e12, 1)
    print(f"MXU bf16 2048^3: {t*1e3:.3f} ms -> {out['mxu_bf16_TFLOPs']} TFLOP/s")

    # 5. empty fori per-iteration overhead (scalar carry)
    def empty_loop(s, n):
        return jax.lax.fori_loop(0, n, lambda i, c: c + s * 1e-9,
                                 jnp.float32(0.0))

    t = slope(empty_loop, 20000)
    out["fori_scalar_overhead_ns"] = round(t * 1e9, 1)
    print(f"fori scalar overhead: {t*1e9:.1f} ns/iter")

    # 6. gather row fetch at production shapes: 262k random rows of [128]
    tbl = jax.random.normal(key, (87381, 128), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (262144,), 0, 87381)

    def gather_loop(s, n):
        def body(i, c):
            return c * 1e-6 + jnp.take(tbl, (idx + i) % 87381, axis=0).sum()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t = slope(gather_loop, 20)
    gb = 262144 * 128 * 4 / t / 1e9
    out["gather_128col_GBps"] = round(gb, 1)
    print(f"gather 262k x [128] rows: {t*1e3:.3f} ms -> {gb:.1f} GB/s")

    if args.json:
        json.dump(out, open(args.json, "w"), indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
