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

if not _os.environ.get("UFO_NO_COMPILE_CACHE"):
    # Persistent XLA compilation cache for every CLI entry: first compile of
    # the full render program is 60-110s on the chip (and minutes on the
    # 1-core CPU fallback); the cache is keyed on HLO + compiler version, so
    # re-runs of the same shapes skip it entirely. Opt out via env.
    import jax as _jax2

    _jax2.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                        _os.path.expanduser("~/.cache/uforecon_tpu_xla")))
    _jax2.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax2.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
