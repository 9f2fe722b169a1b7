"""Multi-chip execution: meshes, sharded batched eval, parallel training steps."""
