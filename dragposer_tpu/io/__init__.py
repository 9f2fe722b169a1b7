"""IO: BVH motion-capture file reading and writing."""

from dragposer_tpu.io.bvh import BVH  # noqa: F401
