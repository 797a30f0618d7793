"""Build hook: compile the native C++ BVH into the package.

The ray-mesh intersector (Embree replacement for the reference's
evaluation/clean_mesh.py frustum filter) is a ctypes shared library built
from ``native/bvh.cpp``. For installed wheels it must live inside the
package, so this custom ``build_py`` compiles it into
``uforecon_tpu/native/`` at build time; source checkouts keep using the
repo-level ``native/`` via the loader's search path (best-effort ``make``).
The build is best-effort: without a C++ toolchain the package still
installs and ``postproc/raycast.py`` falls back to vectorized numpy.
"""
import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py as _build_py

ROOT = os.path.dirname(os.path.abspath(__file__))


class build_py(_build_py):
    def run(self):
        super().run()
        src_dir = os.path.join(ROOT, "native")
        try:
            subprocess.run(["make", "-C", src_dir], check=True, timeout=300)
        except Exception as exc:  # toolchain-less install: numpy fallback
            print(f"[uforecon-tpu] native BVH build skipped: {exc}")
            return
        so = os.path.join(src_dir, "libuforecon_bvh.so")
        if os.path.exists(so):
            dest = os.path.join(self.build_lib, "uforecon_tpu", "native")
            os.makedirs(dest, exist_ok=True)
            shutil.copy2(so, dest)


setup(cmdclass={"build_py": build_py})
