"""Build hook: compile the native frontend (libqtts.so) into the wheel.

The C ABI library (native/) is built with make and shipped as package data in
``leaxer_qwen3_tts_tpu/_native/``; frontend/native.py searches there first and
falls back to an in-tree build or the pure-Python implementations.
"""

import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        root = os.path.dirname(os.path.abspath(__file__))
        native_dir = os.path.join(root, "native")
        lib = os.path.join(native_dir, "build", "libqtts.so")
        try:
            subprocess.run(["make", "-C", native_dir], check=True)
        except (OSError, subprocess.SubprocessError) as e:
            print(f"warning: native build failed ({e}); wheel will use the "
                  "pure-Python frontend fallbacks")
        if os.path.exists(lib):
            dest = os.path.join(root, "leaxer_qwen3_tts_tpu", "_native")
            os.makedirs(dest, exist_ok=True)
            shutil.copy2(lib, dest)
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
