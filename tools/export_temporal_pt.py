"""Export a native temporal.npz checkpoint to the reference's temporal.pt.

Inverse of ``dragposer_tpu.models.torch_import.load_temporal``; lets the
*reference implementation* run with a temporal model trained by this
framework (used for golden-trajectory parity runs).

Usage: python tools/export_temporal_pt.py <model_dir_with_temporal.npz> <out.pt>
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dragposer_tpu.models import checkpoint  # noqa: E402


def main(model_dir: str, out_path: str) -> None:
    params, extra = checkpoint.load(os.path.join(model_dir, "temporal.npz"))

    sd = {}

    def put(name, arr):
        sd[name] = torch.from_numpy(np.asarray(arr).copy())

    def put_lin(prefix, p):
        put(f"{prefix}.weight", p["w"])
        put(f"{prefix}.bias", p["b"])

    def put_attn(prefix, p):
        put(f"{prefix}.in_proj_weight", p["in_w"])
        put(f"{prefix}.in_proj_bias", p["in_b"])
        put(f"{prefix}.out_proj.weight", p["out_w"])
        put(f"{prefix}.out_proj.bias", p["out_b"])

    def put_ln(prefix, p):
        put(f"{prefix}.weight", p["g"])
        put(f"{prefix}.bias", p["b"])

    put_lin("in_proj_encoder", params["in_proj_enc"])
    put_lin("in_proj_decoder", params["in_proj_dec"])
    put_lin("out_proj", params["out_proj"])
    for i, lp in enumerate(params["enc_layers"]):
        pre = f"temporal.encoder.layers.{i}"
        put_attn(f"{pre}.self_attn", lp["self_attn"])
        put_lin(f"{pre}.linear1", lp["ff1"])
        put_lin(f"{pre}.linear2", lp["ff2"])
        put_ln(f"{pre}.norm1", lp["ln1"])
        put_ln(f"{pre}.norm2", lp["ln2"])
    for i, lp in enumerate(params["dec_layers"]):
        pre = f"temporal.decoder.layers.{i}"
        put_attn(f"{pre}.self_attn", lp["self_attn"])
        put_attn(f"{pre}.multihead_attn", lp["cross_attn"])
        put_lin(f"{pre}.linear1", lp["ff1"])
        put_lin(f"{pre}.linear2", lp["ff2"])
        put_ln(f"{pre}.norm1", lp["ln1"])
        put_ln(f"{pre}.norm2", lp["ln2"])
        put_ln(f"{pre}.norm3", lp["ln3"])
    put_ln("temporal.encoder.norm", params["enc_norm"])
    put_ln("temporal.decoder.norm", params["dec_norm"])

    # the reference's PositionalEncoding registers a buffer that lands in the
    # state dict; recreate it (positional_encoding.py:15-28)
    import math

    d, max_len = 48, 30
    pe = torch.zeros(max_len, d)
    pos = torch.arange(0, max_len, dtype=torch.float).view(-1, 1)
    div = torch.exp(torch.arange(0, d, 2).float() * (-math.log(10000.0)) / d)
    pe[:, 0::2] = torch.sin(pos * div)
    pe[:, 1::2] = torch.cos(pos * div)
    sd["positional_encoding.pos_encoding"] = pe

    torch.save(
        {
            "model_state_dict": sd,
            "means_latent": torch.from_numpy(np.asarray(extra["means_latent"]).copy()),
            "stds_latent": torch.from_numpy(np.asarray(extra["stds_latent"]).copy()),
        },
        out_path,
    )
    print(f"wrote {out_path} ({len(sd)} tensors)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
