"""vorta_tpu — TPU-native video-diffusion acceleration framework.

A from-scratch JAX/Pallas rebuild of the capabilities of VORTA
("Efficient Video Diffusion via Routing Sparse Attention", arXiv 2505.18809,
reference implementation wenhao728/VORTA): video Diffusion Transformers
(Wan 2.1, HunyuanVideo) whose self-attention is a mixture of three attention
experts — full 3D attention, similarity-pooled low-resolution attention, and
sliding-tile attention — selected per attention head and diffusion timestep by
a tiny learned router.

Design stance (TPU-first, not a port):
  * Native Flax NNX DiT implementations instead of monkey-patched diffusers
    classes (reference: vorta/patch/modeling_*.py).
  * A single block-sparse Pallas flash-attention kernel whose per-head KV
    block tables express all three experts (reference drives cuDNN SDPA +
    compiled flex_attention Triton kernels).
  * Ulysses sequence parallelism as `shard_map` + `jax.lax.all_to_all` over an
    ICI mesh axis (reference: torch.distributed/NCCL, vorta/ulysses/).
  * Static shapes everywhere: attention geometry (group indices, tile
    permutations, block masks) is precomputed host-side as a pure function of
    the latent shape and persisted with checkpoints.
"""

__version__ = "0.1.0"
