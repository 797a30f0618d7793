"""UFORecon-TPU: a TPU-native generalizable sparse-view neural surface
reconstruction framework (JAX / XLA / Pallas / pjit).

Re-designed from scratch with the capabilities of UFORecon (CVPR 2024,
arXiv:2403.05086; reference implementation surveyed in /root/repo/SURVEY.md).
The compute path is pure-functional JAX compiled by XLA for TPU; rendering is
sharded over a device mesh along the ray axis; post-processing (TSDF fusion,
mesh cleaning, chamfer eval) runs on host with native helpers.

Layout conventions (TPU-first, differs from the torch reference on purpose):
  * images / feature maps are channels-last  (..., H, W, C)
  * volumes are (..., D, H, W, C)
  * camera matrices are float32; network compute may be bfloat16
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("UFO_PLATFORM"):
    # Force a JAX platform before any backend initializes. The JAX_PLATFORMS
    # env var is not reliable here: site hooks that pre-register accelerator
    # plugins can override it, and a dead accelerator tunnel then hangs every
    # process at first device query. jax.config.update always wins as long as
    # it runs before the first computation — importing this package is the
    # common entry for every CLI.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["UFO_PLATFORM"])
