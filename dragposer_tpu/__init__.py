"""dragposer_tpu — a TPU-native motion-reconstruction framework.

Reconstructs full-body 22-joint pose streams from variable sparse 6-DoF
tracking signals (6/5/4/3 trackers) via gradient-descent optimization in the
latent space of a structured pose VAE, guided by a temporal transformer that
keeps the optimization on the manifold of plausible motion.

Capability parity target: UPC-ViRVIG/DragPoser (Eurographics 2025,
arXiv:2406.14567).  The design, however, is TPU-first:

* all per-frame math is one compiled XLA computation (``lax.scan`` over
  frames, ``lax.while_loop`` over latent-optimization iterations) instead of
  an interpreted per-frame loop;
* forward kinematics is fully parallel (one batched quaternion product plus a
  static ancestor-matrix matmul) instead of a sequential parent-chain loop;
* batches of sequences are reconstructed concurrently via ``vmap`` and
  sharded over device meshes with ``jax.sharding``.

Package layout::

    ops/       quaternion / dual-quaternion / FK kernels + skeleton topology
    io/        BVH reader & writer
    data/      motion encoding (root-space dual quats), datasets, statistics
    models/    pose VAE, temporal transformer, torch-checkpoint importer
    drag/      the drag-optimization runtime (the product)
    train/     VAE + temporal training loops (optax)
    parallel/  mesh / sharding helpers for multi-chip execution
    cli/       command-line entry points mirroring the reference CLIs
    runtime/   realtime serving surface (TCP protocol, C ABI backend)
"""

__version__ = "0.1.0"
