"""Native (C++) host-runtime components.

Built lazily on first import with the system toolchain; all callers fall back
to the numpy/cv2 path if the extension is unavailable.
"""

import os
import subprocess
import sysconfig

_HERE = os.path.dirname(__file__)


def _build():
    import numpy as np
    src = os.path.join(_HERE, "image_ops.cpp")
    out = os.path.join(_HERE, "_image_ops.so")
    if (os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(src)):
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
        src, "-o", out, "-pthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


try:
    _build()
    import importlib.util as _ilu

    _spec = _ilu.spec_from_file_location(
        "casmtr_tpu.native._image_ops", os.path.join(_HERE, "_image_ops.so"))
    _image_ops = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_image_ops)
    resize_pad_normalize = _image_ops.resize_pad_normalize
    HAVE_NATIVE = True
except Exception:  # pragma: no cover - toolchain-dependent
    resize_pad_normalize = None
    HAVE_NATIVE = False
