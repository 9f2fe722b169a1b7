"""Math kernels: quaternions, dual quaternions, forward kinematics, topology."""

import contextlib


def host_device():
    """Context manager placing eager math on the host CPU backend.

    Host-side pre/post-processing must not dispatch op-by-op to a tunneled
    TPU (each eager op costs a remote compile there); inside compiled
    programs this is irrelevant.
    """
    import jax

    try:
        # local_devices, NOT devices: in a multi-process (DCN) run
        # jax.devices("cpu")[0] belongs to process 0, and pinning another
        # process's eager math to it yields non-addressable arrays
        return jax.default_device(jax.local_devices(backend="cpu")[0])
    except RuntimeError:
        return contextlib.nullcontext()


from dragposer_tpu.ops import quat, dual_quat, fk, topology  # noqa: F401,E402
