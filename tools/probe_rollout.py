"""Prototype: transposed batch-in-lanes temporal rollout vs the vmapped one.

Measures the window-0 rollout (encoder 15 tokens + decoder 1 token) at
bench batch size with real checkpoint weights, via ΔN scan timing
(cancels the ~29 ms tunnel constant).  Checks numeric agreement too.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("B", "1024"))
N1, N2 = 100, 500


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dragposer_jax_cache")

    from dragposer_tpu import config as cfg
    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
    from dragposer_tpu.data import encoding
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.models import temporal as tm
    from dragposer_tpu.ops.topology import Skeleton

    bvh = BVH().load("/root/reference/python/data/example/eval/example.bvh")
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    skeleton = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "models/model_dancedb_example"),
        parents, resolve_config("6_trackers"), use_temporal=True,
        skeleton=skeleton)
    params = engine.model.temporal
    param = engine.tparam

    S, L = 15, engine.model.means_latent.shape[0]
    D_in = L + 3 + 6
    key = jax.random.PRNGKey(0)
    enc_in = jax.random.normal(key, (B, S, D_in)) * 0.5
    tok = jax.random.normal(key, (B, 1, L)) * 0.5

    # ---- current: vmapped per-lane forward
    def cur(x):
        out = jax.vmap(lambda e, t: tm.forward(params, param, e, t))(x, tok)
        return x + 1e-6 * out.sum(-1).sum(-1)[:, None, None]

    # ---- transposed prototype
    d = param["features_transformer"]
    H = param["n_heads"]
    dh = d // H
    import math

    pe = tm.positional_encoding(len(param["past_frames"])
                                + len(param["future_frames"]), d)

    def lin_T(x, p):  # x (S, I, B) -> (S, O, B)
        return jnp.einsum("oi,sib->sob", p["w"], x) + p["b"][None, :, None]

    def ln_T(x, p):   # over dim axis=1
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-5) * p["g"][None, :, None] \
            + p["b"][None, :, None]

    def attn_T(p, q_in, kv_in, mask=None):
        wq, wk, wv = jnp.split(p["in_w"], 3, axis=0)
        bq, bk, bv = jnp.split(p["in_b"], 3, axis=0)
        q = jnp.einsum("oi,sib->sob", wq, q_in) + bq[None, :, None]
        k = jnp.einsum("oi,sib->sob", wk, kv_in) + bk[None, :, None]
        v = jnp.einsum("oi,sib->sob", wv, kv_in) + bv[None, :, None]
        q = q.reshape(q.shape[0], H, dh, -1)
        k = k.reshape(k.shape[0], H, dh, -1)
        v = v.reshape(v.shape[0], H, dh, -1)
        s = jnp.einsum("qhdb,khdb->hqkb", q, k) / math.sqrt(dh)
        if mask is not None:
            s = s + mask[None, :, :, None]
        a = jax.nn.softmax(s, axis=2)
        o = jnp.einsum("hqkb,khdb->qhdb", a, v)
        o = o.reshape(q_in.shape[0], d, -1)
        return jnp.einsum("oi,sib->sob", p["out_w"], o) + p["out_b"][None, :, None]

    def ff_T(lp, x):
        h = jax.nn.relu(lin_T(x, lp["ff1"]))
        return lin_T(h, lp["ff2"])

    def fwd_T(encT, tokT):
        src = lin_T(encT, params["in_proj_enc"])
        tgt = lin_T(tokT, params["in_proj_dec"])
        src = src + pe[:src.shape[0], :, None]
        tgt = tgt + pe[:tgt.shape[0], :, None]
        for lp in params["enc_layers"]:
            src = ln_T(src + attn_T(lp["self_attn"], src, src), lp["ln1"])
            src = ln_T(src + ff_T(lp, src), lp["ln2"])
        mem = ln_T(src, params["enc_norm"])
        for lp in params["dec_layers"]:
            tgt = ln_T(tgt + attn_T(lp["self_attn"], tgt, tgt), lp["ln1"])
            tgt = ln_T(tgt + attn_T(lp["cross_attn"], tgt, mem), lp["ln2"])
            tgt = ln_T(tgt + ff_T(lp, tgt), lp["ln3"])
        out = ln_T(tgt, params["dec_norm"])
        return lin_T(out, params["out_proj"])

    # numeric agreement
    ref = jax.vmap(lambda e, t: tm.forward(params, param, e, t))(enc_in, tok)
    got = fwd_T(jnp.moveaxis(enc_in, 0, -1), jnp.moveaxis(tok, 0, -1))
    diff = np.abs(np.moveaxis(np.asarray(got), -1, 0) - np.asarray(ref)).max()
    print(f"max |diff| vs vmapped forward: {diff:.2e}", flush=True)

    encT0 = jnp.moveaxis(enc_in, 0, -1)
    tokT0 = jnp.moveaxis(tok, 0, -1)

    def trans(x):
        out = fwd_T(x, tokT0)
        return x + 1e-6 * out.sum(0).sum(0)[None, None, :]

    def delta_time(step, x0):
        def runner(n):
            @jax.jit
            def run(x):
                def body(c, _):
                    return step(c), None
                o, _ = jax.lax.scan(body, x, None, length=n)
                return o
            r = run(x0)
            jax.block_until_ready(r)
            ts = []
            for _ in range(3):
                t0 = time.time()
                r = run(x0)
                jax.block_until_ready(r)
                ts.append(time.time() - t0)
            return min(ts)
        t1, t2 = runner(N1), runner(N2)
        return (t2 - t1) / (N2 - N1) * 1e6

    print(f"vmapped rollout      : {delta_time(cur, enc_in):8.1f} us/call",
          flush=True)
    print(f"transposed rollout   : {delta_time(trans, encT0):8.1f} us/call",
          flush=True)

    # bf16 variant of the vmapped path: cast weights + inputs
    params16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def cur16(x):
        out = jax.vmap(lambda e, t: tm.forward(
            params16, param, e, t))(x.astype(jnp.bfloat16),
                                    tok.astype(jnp.bfloat16))
        return x + 1e-6 * out.sum(-1).sum(-1)[:, None, None].astype(x.dtype)

    print(f"vmapped bf16 rollout : {delta_time(cur16, enc_in):8.1f} us/call",
          flush=True)


if __name__ == "__main__":
    main()
