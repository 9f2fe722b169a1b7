"""Micro-benchmark the temporal-rollout forward in isolation on the TPU.

The rollout is the largest single section of the drag frame step
(~2.3 ms/frame at B=512, tools/profile_drag.py).  This harness times one
window-0 rollout step — forward(enc_in (B,14,33), dec_in (B,1,24)) — for the
reference implementation and any fused variants, so kernel work can iterate
without rebuilding the whole engine.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dragposer_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dragposer_tpu import config as cfg
    from dragposer_tpu.models import temporal

    B = int(os.environ.get("B", "512"))
    S_ENC, S_DEC = 14, 1
    param = cfg.TEMPORAL_PARAM
    key = jax.random.PRNGKey(0)
    params = temporal.init_params(key, param)
    enc_in = jax.device_put(np.random.default_rng(0).normal(
        size=(B, S_ENC, 33)).astype(np.float32))
    dec_in = jax.device_put(np.random.default_rng(1).normal(
        size=(B, S_DEC, 24)).astype(np.float32))
    mask = jnp.zeros((S_DEC, S_DEC), jnp.float32)

    # The tunneled dev TPU adds ~25 ms dispatch latency per jit call, so a
    # single forward cannot be timed host-side.  Chain N data-dependent
    # forwards in one lax.scan and divide.
    N = int(os.environ.get("N", "50"))

    def chained(fwd):
        def step(d, _):
            # perturb enc_in with the carry so the encoder is NOT
            # loop-invariant (XLA would hoist it out of the scan)
            e = enc_in + 1e-6 * d[:, :1, :1]
            out = fwd(e, d)
            return dec_in + 0.01 * out, out[:, -1, :1]

        def run(d0):
            return jax.lax.scan(step, d0, None, length=N)

        return jax.jit(run)

    variants = {
        "reference": (lambda e, d: temporal.forward(
            params, param, e, d, tgt_mask=mask)),
    }
    try:
        from dragposer_tpu.ops import temporal_fused

        fused_params = temporal_fused.pack_params(params, param)
        variants["fused"] = (lambda e, d: temporal_fused.forward(
            fused_params, param, e, d, tgt_mask=mask))
    except ImportError:
        pass

    outs = {}
    for name, fwd in variants.items():
        fn = chained(fwd)
        out, _ = fn(dec_in)
        jax.block_until_ready(out)
        ts = []
        for _ in range(10):
            t0 = time.time()
            out, _ = fn(dec_in)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        per = min(ts) / N * 1e3
        outs[name] = np.asarray(jax.jit(lambda e, d: fwd(e, d))(enc_in, dec_in))
        print(f"{name:12s} {per:7.3f} ms/forward  (N={N}, min total "
              f"{min(ts)*1e3:.1f} ms)")
    if "fused" in outs:
        err = np.abs(outs["fused"] - outs["reference"]).max()
        ref = np.abs(outs["reference"]).max()
        print(f"fused max abs err {err:.3e} (ref magnitude {ref:.3f})")


if __name__ == "__main__":
    main()
