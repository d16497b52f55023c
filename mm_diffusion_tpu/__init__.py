"""mm_diffusion_tpu — TPU-native multi-modal (joint audio+video) diffusion.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
researchmm/MM-Diffusion (CVPR 2023), re-designed TPU-first:

* channels-last layouts, bf16 compute with fp32 parameters/norm/softmax
* diffusion state as a pytree (``{"video", "audio"}`` or a single array)
* samplers as jit-compiled ``lax.scan`` loops (DDPM/DDIM/DPM-Solver++)
* SPMD scale-out via ``jax.sharding.Mesh`` + ``pjit`` (data / fsdp axes)
"""

__version__ = "0.1.0"
