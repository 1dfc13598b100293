"""Loader for the upstream pure-torch oracle (test-time only).

If /root/reference is mounted, load gsplat/cuda/_torch_impl.py directly by
path (it is self-contained: torch-only at import time). Tests that compare
against it skip gracefully when the reference isn't available, keeping this
repo standalone.
"""

import importlib.util
import os

REF_TORCH_IMPL = "/root/reference/gsplat/cuda/_torch_impl.py"
REF_TORCH_IMPL_2DGS = "/root/reference/gsplat/cuda/_torch_impl_2dgs.py"


def _load(path, name):
    if not os.path.exists(path):
        return None
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


def get_torch_impl():
    return _load(REF_TORCH_IMPL, "ref_torch_impl")


def get_torch_impl_2dgs():
    """_torch_impl_2dgs imports `gsplat.cuda._torch_impl`; register our
    path-loaded copy under that name so the import resolves without
    installing gsplat."""
    import sys
    import types

    base = get_torch_impl()
    if base is None:
        return None
    if "gsplat" not in sys.modules:
        pkg = types.ModuleType("gsplat")
        cuda = types.ModuleType("gsplat.cuda")
        sys.modules["gsplat"] = pkg
        sys.modules["gsplat.cuda"] = cuda
        sys.modules["gsplat.cuda._torch_impl"] = base
    return _load(REF_TORCH_IMPL_2DGS, "ref_torch_impl_2dgs")
