"""The d_model-packing question (round-3 VERDICT #9), answered by probe.

ROADMAP's trace accounting says the temporal train step sits within ~2x of
its thin-d_model roofline: every matmul in the transformer contracts over
K = d_model = 48 (or emits N = 48), so the 128x128 MXU runs at <= 48/128
K-occupancy.  "d_model packing" would try to recover that by giving the
systolic array a fuller contraction.  This probe measures what is actually
recoverable:

  1. the K-occupancy ceiling itself: time (M,K)@(K,2048) for K in
     {48, 96, 128} at equal OUTPUT work (M*2048 elements) — if achieved
     FLOP/s scale with K, the ceiling is real and binding;
  2. the only semantics-preserving packings available:
       a. N-packing (already shipped): QKV as one (144,48) projection —
          more output columns, same K; measured vs three separate dots;
       b. K-padding: zero-pad features 48->128 and contract over 128 —
          35% MORE multiply work on a fuller array (the array is padded
          with zeros either way; this just makes the waste explicit).

Expected (and measured - see ROADMAP): packing the K dim without changing
model semantics is impossible — the 48-wide contraction IS the model
(d_model, latent 24, heads 4x12 are the reference's architecture and part
of the parity contract).  The probe pins the number so the conclusion is
a measurement, not an assertion.

Run on the TPU:  python tools/probe_dmodel_packing.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = int(os.environ.get("M", str(15 * 4096)))   # enc tokens x bench batch
REPS = int(os.environ.get("REPS", "50"))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dragposer_jax_cache")

    key = jax.random.PRNGKey(0)

    def bench(fn, *args, n=REPS):
        out = jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    print(f"# K-occupancy ceiling: (M={M}, K)@(K, 2048), bf16 inputs, "
          f"f32 accum")
    results = {}
    for K in (48, 96, 128):
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        w = jax.random.normal(key, (K, 2048), jnp.bfloat16)
        f = jax.jit(lambda x, w: jnp.dot(x, w,
                                         preferred_element_type=jnp.float32))
        dt = bench(f, x, w)
        tf = 2 * M * K * 2048 / dt / 1e12
        results[K] = (dt, tf)
        print(f"  K={K:3d}: {dt*1e3:7.3f} ms  {tf:6.2f} TF/s")
    r48, r128 = results[48][1], results[128][1]
    print(f"  -> achieved-FLOPs ratio K=128/K=48: {r128/r48:.2f} "
          f"(ceiling predicts ~{128/48:.2f} if K-bound, ~1.0 if DMA-bound)")

    print("# N-packing (shipped): QKV as one (48,144) dot vs 3x(48,48)")
    x = jax.random.normal(key, (M, 48), jnp.bfloat16)
    w3 = jax.random.normal(key, (48, 144), jnp.bfloat16)
    w1 = [jax.random.normal(jax.random.PRNGKey(i), (48, 48), jnp.bfloat16)
          for i in range(3)]
    packed = jax.jit(lambda x, w: jnp.dot(x, w,
                                          preferred_element_type=jnp.float32))
    split = jax.jit(lambda x, a, b, c: (
        jnp.dot(x, a, preferred_element_type=jnp.float32),
        jnp.dot(x, b, preferred_element_type=jnp.float32),
        jnp.dot(x, c, preferred_element_type=jnp.float32)))
    tp = bench(packed, x, w3)
    ts = bench(split, x, *w1)
    print(f"  packed {tp*1e3:.3f} ms vs split {ts*1e3:.3f} ms "
          f"({ts/tp:.2f}x)")

    print("# K-padding 48->128 (explicit-zero contraction): same output")
    x48 = jax.random.normal(key, (M, 48), jnp.bfloat16)
    w48 = jax.random.normal(key, (48, 2048), jnp.bfloat16)
    pad = jax.jit(lambda x, w: jnp.dot(
        jnp.pad(x, ((0, 0), (0, 80))), jnp.pad(w, ((0, 80), (0, 0))),
        preferred_element_type=jnp.float32))
    plain = jax.jit(lambda x, w: jnp.dot(x, w,
                                         preferred_element_type=jnp.float32))
    t_pad = bench(pad, x48, w48)
    t_plain = bench(plain, x48, w48)
    print(f"  plain K=48 {t_plain*1e3:.3f} ms vs padded-to-128 "
          f"{t_pad*1e3:.3f} ms ({t_pad/t_plain:.2f}x — padding buys "
          f"nothing, XLA already pads the array)")


if __name__ == "__main__":
    main()
