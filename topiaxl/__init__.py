"""topiaxl — a TPU-native (JAX/XLA/Pallas) framework for PrimX 3D asset generation.

Re-designed from scratch with the capabilities of 3DTopia-XL (reference:
/root/reference): a Diffusion Transformer over PrimX volumetric primitives,
a 3D VAE payload compressor, DINOv2 image conditioning, a volumetric
primitive raymarcher, and a full PrimX -> textured GLB extraction pipeline.

Everything on the compute path is JAX (jit/vmap/shard_map/pallas); the
design targets TPU MXU/VPU + HBM characteristics rather than translating
the reference's CUDA kernels.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: first-compile of the flagship graphs
# through the remote-compile path costs minutes; caching makes every
# subsequent process start warm. Opt out with TOPIAXL_COMPILATION_CACHE=0.
if _os.environ.get("TOPIAXL_COMPILATION_CACHE", "1") != "0":
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/topiaxl_jax"),
    )
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
