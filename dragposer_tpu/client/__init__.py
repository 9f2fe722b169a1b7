"""Client layer: the reference Unity client's capabilities as a library.

* :mod:`client.math` — smoothing, damping, continuity, LH/RH + xyzw/wxyz
  conversions (``Core/DragPoser.cs``, ``Utils/MathExtensions.cs``);
* :mod:`client.retarget` — T-pose tracker retargeting
  (``Core/TrackerRetargeter.cs``);
* :mod:`client.driver` — the per-frame client pipeline (``Core/DragPoser.cs``);
* :mod:`client.playback` — BVH-driven tracker playback (``BVH/BVHPlayback.cs``);
* :mod:`client.vr` — VR device plumbing: detection, plane-fit role
  identification, T-pose calibration, the VRIK six-role rig, and the timed
  status display (``VRController.cs``, ``Applications/VRIK.cs``,
  ``Utils/DisplayMirror.cs``) behind a hardware-agnostic device-provider
  protocol;
* ``cli/interactive.py`` — browser viewer with draggable end effectors and
  live mask/weight editing (``Applications/FBIK.cs``).
"""

from dragposer_tpu.client import math  # noqa: F401
