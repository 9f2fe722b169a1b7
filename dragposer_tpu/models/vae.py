"""Structured pose VAE (encoder / decoder) as pure JAX functions.

Architecture parity with the reference autoencoder
(``python/src/autoencoder.py``):

* encoder: 3 × (SkeletonConv → SkeletonPool → LeakyReLU 0.2) collapsing
  22 → 14 → 9 → 6 joints at 8 channels/joint, then linear heads 48 → 24 for
  (mu, logvar); logvar weights zero-initialized so initial variance is 1;
* decoder: linear 24 → 24 (6 joints × 4 ch), 3 × (SkeletonUnpool →
  SkeletonConv [→ LeakyReLU]) expanding 6 → 10 → 15 → 23 slots (the last slot
  is the displacement pseudo-joint), output 92 = 22 joints × 4 quat channels
  + 4 displacement channels (3 used);
* the decoder denormalizes its quaternion output, unit-normalizes it, and
  re-normalizes, so the network always emits unit quaternions in normalized
  space (``autoencoder.py:241-253``).

The static structure (masks, pool matrices) is derived from the skeleton at
build time; the pretrained checkpoint's stored masks are verified against it
on import.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dragposer_tpu.models import skeleton_nn as nn
from dragposer_tpu.ops import quat, topology

N_LAYERS = 3
ENC_CPJ = 8   # encoder channels per joint (channel_factor 1)
DEC_CPJ = 4   # decoder channels per joint
CHANNELS_PER_JOINT = 4  # quaternion channels in the output pose


@dataclass(frozen=True)
class VAEStatics:
    """Static (non-trainable) structure shared by encoder and decoder."""

    enc_masks: Tuple[np.ndarray, ...]     # conv masks per encoder layer
    enc_pools: Tuple[np.ndarray, ...]     # pooling matrices
    dec_masks: Tuple[np.ndarray, ...]     # conv masks per decoder layer
    dec_unpools: Tuple[np.ndarray, ...]   # unpooling matrices
    kernel: int
    padding: int
    stride: int
    latent_dim: int
    n_joints: int


def build_statics(parents, param) -> VAEStatics:
    """Derive all static structure from the skeleton topology."""
    kernel = param["kernel_size_temporal_dim"]
    nd = param["neighbor_distance"]

    # Encoder: pooling without the displacement pseudo-joint.
    enc_parents = [np.asarray(parents)]
    enc_poolings = []
    p = parents
    for _ in range(N_LAYERS):
        pooling, p = topology.pooling_schedule(p, add_displacement=False)
        enc_poolings.append(pooling)
        enc_parents.append(np.asarray(p))

    enc_masks, enc_pools = [], []
    for l in range(N_LAYERS):
        hood = topology.neighbor_lists(enc_parents[l], nd, add_displacement=False)
        enc_masks.append(topology.conv_mask(hood, ENC_CPJ, ENC_CPJ, kernel))
        enc_pools.append(
            topology.pool_matrix(enc_poolings[l], len(enc_parents[l]), ENC_CPJ)
        )

    # Decoder: displacement pseudo-joint added on levels 0 and 1
    # (reference ``autoencoder.py:162-166``: add on all but the last level).
    dec_parents = [np.asarray(parents)]
    dec_poolings = []
    p = parents
    for l in range(N_LAYERS):
        pooling, p = topology.pooling_schedule(
            p, add_displacement=(l != N_LAYERS - 1)
        )
        dec_poolings.append(pooling)
        dec_parents.append(np.asarray(p))

    dec_masks, dec_unpools = [], []
    for l in range(N_LAYERS):
        level = N_LAYERS - l - 1
        hood = topology.neighbor_lists(dec_parents[level], nd, add_displacement=True)
        dec_masks.append(topology.conv_mask(hood, DEC_CPJ, DEC_CPJ, kernel))
        dec_unpools.append(topology.unpool_matrix(dec_poolings[level], DEC_CPJ))

    # HOST (numpy) arrays on purpose: statics are closure-captured by the
    # jitted programs (embedded as constants at trace time) and consumed
    # eagerly by host-side folding/verification (fold_decoder,
    # torch_import).  jnp.asarray here would pin them to the default
    # device, and fetching them back over a tunneled TPU is slow (~90 s
    # first fetch per process) and the transport's one sporadically-
    # hanging operation.
    return VAEStatics(
        enc_masks=tuple(np.asarray(m, np.float32) for m in enc_masks),
        enc_pools=tuple(np.asarray(m, np.float32) for m in enc_pools),
        dec_masks=tuple(np.asarray(m, np.float32) for m in dec_masks),
        dec_unpools=tuple(np.asarray(m, np.float32) for m in dec_unpools),
        kernel=kernel,
        padding=(kernel - 1) // 2,
        stride=param["stride_encoder_conv"],
        latent_dim=param["latent_dim"],
        n_joints=len(parents),
    )


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_params(key, parents, param) -> Dict:
    """Fresh parameters with reference-equivalent initialization."""
    statics = build_statics(parents, param)
    nd = param["neighbor_distance"]
    kernel = statics.kernel
    keys = jax.random.split(key, 16)

    # rebuild level parent lists for neighborhood-restricted init
    enc_parents = [np.asarray(parents)]
    p = parents
    for _ in range(N_LAYERS):
        _, p = topology.pooling_schedule(p, add_displacement=False)
        enc_parents.append(np.asarray(p))
    dec_parents = [np.asarray(parents)]
    p = parents
    for l in range(N_LAYERS):
        _, p = topology.pooling_schedule(p, add_displacement=(l != N_LAYERS - 1))
        dec_parents.append(np.asarray(p))

    enc_convs = []
    for l in range(N_LAYERS):
        hood = topology.neighbor_lists(enc_parents[l], nd, add_displacement=False)
        enc_convs.append(nn.init_skeleton_conv(keys[l], hood, ENC_CPJ, ENC_CPJ, kernel))
    latent_in = ENC_CPJ * len(enc_parents[-1])
    encoder = {
        "convs": enc_convs,
        "f_mu": nn.init_linear(keys[3], latent_in, statics.latent_dim),
        "f_logvar": nn.init_linear(keys[4], latent_in, statics.latent_dim,
                                   zero_weight=True),
    }

    dec_convs = []
    for l in range(N_LAYERS):
        level = N_LAYERS - l - 1
        hood = topology.neighbor_lists(dec_parents[level], nd, add_displacement=True)
        dec_convs.append(nn.init_skeleton_conv(keys[5 + l], hood, DEC_CPJ, DEC_CPJ, kernel))
    decoder = {
        "f_latent": nn.init_linear(keys[8], statics.latent_dim,
                                   DEC_CPJ * len(dec_parents[-1])),
        "convs": dec_convs,
    }
    return {"encoder": encoder, "decoder": decoder}


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def encode(params, statics: VAEStatics, x):
    """x: (B, J*8, T) normalized root-space dual quats → (mu, logvar) (B, L).

    The reference trains with window_size 1; the flatten over (C, T) matches
    torch's ``flatten(start_dim=1)`` for any T but the linear head was trained
    with T == 1.
    """
    h = x
    for l in range(N_LAYERS):
        h = nn.skeleton_conv(h, params["convs"][l], statics.enc_masks[l],
                             statics.padding, statics.stride)
        h = nn.pool(h, statics.enc_pools[l])
        h = nn.leaky_relu(h)
    h = h.reshape(h.shape[0], -1)
    return nn.linear(h, params["f_mu"]), nn.linear(h, params["f_logvar"])


def reparameterize(key, mu, logvar):
    std = jnp.exp(0.5 * logvar)
    return mu + jax.random.normal(key, std.shape, dtype=std.dtype) * std


def decode(params, statics: VAEStatics, z, mean_dqs, std_dqs):
    """z: (B, L) → (motion (B, J*4, 1), displacement (B, 3, 1)).

    Output motion is *normalized* root-space quaternion channels whose
    denormalized values are unit quaternions.
    """
    cpj = CHANNELS_PER_JOINT
    h = nn.linear(z, params["f_latent"])[..., None]  # (B, F, 1)
    for l in range(N_LAYERS):
        h = nn.unpool(h, statics.dec_unpools[l])
        h = nn.skeleton_conv(h, params["convs"][l], statics.dec_masks[l],
                             statics.padding, 1)
        if l != N_LAYERS - 1:
            h = nn.leaky_relu(h)
    motion = h[:, :-cpj, :]
    displacement = h[:, -cpj:, :][:, :3, :]

    # quaternion channels of the per-joint stats
    mean_q = mean_dqs.reshape(-1, 8)[:, :cpj].reshape(-1)[None, :, None]
    std_q = std_dqs.reshape(-1, 8)[:, :cpj].reshape(-1)[None, :, None]

    motion = motion * std_q + mean_q
    b, c, t = motion.shape
    m = motion.reshape(b, c // cpj, cpj, t)
    m = quat.normalize(jnp.moveaxis(m, -1, 1))       # (B, T, J, 4), unit
    motion = jnp.moveaxis(m, 1, -1).reshape(b, c, t)
    motion = (motion - mean_q) / std_q
    return motion, displacement


def fold_decoder(dec_params, statics: VAEStatics):
    """Pre-fold the decoder into 3 dense matmuls for inference.

    With kernel size 1 every decoder layer is LeakyReLU(W_conv·mask ·
    W_unpool · h + b); the constant unpool matrices and masks fold into the
    conv weights, and the latent projection folds into layer 0:
    z → 40 → 60 → 92 in exactly three matmuls.  Gradients through the folded
    form equal gradients through the original chain (same linear maps).
    """
    assert statics.kernel == 1, "folding assumes the reference's kernel size 1"
    ws, bs = [], []
    w_in = np.asarray(dec_params["f_latent"]["w"])      # (24, L)
    b_in = np.asarray(dec_params["f_latent"]["b"])      # (24,)
    for l in range(N_LAYERS):
        conv = np.asarray(dec_params["convs"][l]["w"])[:, :, 0] * np.asarray(
            statics.dec_masks[l]
        )[:, :, 0]
        w_layer = conv @ np.asarray(statics.dec_unpools[l])
        if l == 0:
            ws.append(jnp.asarray(w_layer @ w_in))
            bs.append(jnp.asarray(w_layer @ b_in
                                  + np.asarray(dec_params["convs"][l]["b"])))
        else:
            ws.append(jnp.asarray(w_layer))
            bs.append(jnp.asarray(np.asarray(dec_params["convs"][l]["b"])))
    return {"ws": ws, "bs": bs}


def decode_folded(folded, z, mean_dqs, std_dqs):
    """Inference-only equivalent of :func:`decode` on folded weights."""
    cpj = CHANNELS_PER_JOINT
    h = z
    for l in range(N_LAYERS):
        h = jnp.einsum("...i,oi->...o", h, folded["ws"][l],
                       precision="highest") + folded["bs"][l]
        if l != N_LAYERS - 1:
            h = nn.leaky_relu(h)
    h = h[..., None]                                  # (B, 92, 1)
    motion = h[:, :-cpj, :]
    displacement = h[:, -cpj:, :][:, :3, :]

    mean_q = mean_dqs.reshape(-1, 8)[:, :cpj].reshape(-1)[None, :, None]
    std_q = std_dqs.reshape(-1, 8)[:, :cpj].reshape(-1)[None, :, None]
    motion = motion * std_q + mean_q
    b, c, t = motion.shape
    m = motion.reshape(b, c // cpj, cpj, t)
    m = quat.normalize(jnp.moveaxis(m, -1, 1))
    motion = jnp.moveaxis(m, 1, -1).reshape(b, c, t)
    motion = (motion - mean_q) / std_q
    return motion, displacement


def decode_folded_flat(folded, z, mean_dqs, std_dqs):
    """Per-lane inference decode without the legacy (1, C, 1) conv layout.

    Same math as :func:`decode_folded` on ``z[None]`` (identical op order,
    including the per-quat normalize) but flat shapes: ``z`` (L,) →
    ``(pose_n (J*4,), displacement (3,))``.  Under vmap the drag iteration
    then computes on (B, 88) arrays whose minor (lane) dimension is 88,
    instead of (B, 1, 92, 1) whose lane dimension is 1 — the trailing
    singleton time axis of the conv layout wastes 127/128 of every TPU
    vector register in the hot optimization loop."""
    cpj = CHANNELS_PER_JOINT
    h = z
    for l in range(N_LAYERS):
        h = jnp.einsum("...i,oi->...o", h, folded["ws"][l],
                       precision="highest") + folded["bs"][l]
        if l != N_LAYERS - 1:
            h = nn.leaky_relu(h)
    motion = h[..., : -cpj]                           # (..., J*4)
    displacement = h[..., -cpj : -cpj + 3]            # (..., 3)

    mean_q = mean_dqs.reshape(-1, 8)[:, :cpj].reshape(-1)
    std_q = std_dqs.reshape(-1, 8)[:, :cpj].reshape(-1)
    x = motion * std_q + mean_q
    q = quat.normalize(x.reshape(x.shape[:-1] + (-1, cpj)))
    x = q.reshape(x.shape)
    return (x - mean_q) / std_q, displacement


def forward(params, statics: VAEStatics, key, x, mean_dqs, std_dqs):
    """Full VAE pass.  x: (B, J*8, T) → (motion, displacement, mu, logvar, z)."""
    mu, logvar = encode(params["encoder"], statics, x)
    z = reparameterize(key, mu, logvar)
    motion, displacement = decode(params["decoder"], statics, z, mean_dqs, std_dqs)
    return motion, displacement, mu, logvar, z


def sample(params, statics: VAEStatics, key, n_samples: int, mean_dqs,
           std_dqs, mean=None, base_std: float = 0.3):
    """Draw poses from the latent prior N(mean, base_std²) and decode
    (reference ``generator_architecture.py:73-93``)."""
    latent_dim = statics.latent_dim
    if mean is None:
        mu = jnp.zeros((n_samples, latent_dim))
    else:
        mu = jnp.tile(jnp.asarray(mean).reshape(1, latent_dim), (n_samples, 1))
    z = mu + jax.random.normal(key, (n_samples, latent_dim)) * base_std
    return decode(params["decoder"], statics, z, mean_dqs, std_dqs)


def count_params(params, statics: VAEStatics) -> int:
    """Total parameter count as the reference reports it — includes the
    (frozen) conv masks and pool/unpool matrices, which torch registers as
    parameters (``generator_architecture.py:21-25`` prints 168,352)."""
    trainable = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    frozen = sum(
        int(np.prod(m.shape))
        for m in (*statics.enc_masks, *statics.enc_pools,
                  *statics.dec_masks, *statics.dec_unpools)
    )
    return trainable + frozen
