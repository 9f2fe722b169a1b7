"""Client layer: the reference Unity client's capabilities as a library.

* :mod:`client.math` — smoothing, damping, continuity, LH/RH + xyzw/wxyz
  conversions (``Core/DragPoser.cs``, ``Utils/MathExtensions.cs``);
* :mod:`client.retarget` — T-pose tracker retargeting
  (``Core/TrackerRetargeter.cs``);
* :mod:`client.driver` — the per-frame client pipeline (``Core/DragPoser.cs``);
* :mod:`client.playback` — BVH-driven tracker playback (``BVH/BVHPlayback.cs``);
* ``cli/interactive.py`` — browser viewer with draggable end effectors and
  live mask/weight editing (``Applications/FBIK.cs``).
"""

from dragposer_tpu.client import math  # noqa: F401
