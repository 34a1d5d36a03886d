"""sam_pt_tpu — a TPU-native (JAX/XLA/Pallas) video segmentation framework.

Re-implements the capabilities of SysCV/sam-pt (SAM-PT: Segment Anything Meets
Point Tracking) with a TPU-first architecture: the SAM image encoder, prompt
encoder, and mask decoder are batched JAX/Flax programs compiled by XLA; point
trackers are jitted window programs with `lax.scan`/`lax.while_loop` temporal
chaining; the orchestrator processes (frame, mask, point) as array axes instead
of Python loops; multi-chip scale-out uses `jax.sharding.Mesh` + ICI collectives.

Reference layer map: /root/reference — see SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
