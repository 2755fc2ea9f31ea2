"""Load reference (torch) modules from /root/reference WITHOUT executing the
package __init__ (which requires torchvision, absent here).

Used only by parity tests: the reference math on CPU torch is the executable
spec our JAX numerics are checked against. Nothing from here ships in the
framework.
"""

import importlib
import importlib.util
import os
import sys
import types

REF_ROOT = "/root/reference"
_PKG = "vdiff_ref"


def _ensure_pkg():
    if _PKG in sys.modules:
        return
    pkg = types.ModuleType(_PKG)
    pkg.__path__ = [os.path.join(REF_ROOT, "v_diffusion")]
    pkg.__package__ = _PKG
    sys.modules[_PKG] = pkg
    sub = types.ModuleType(_PKG + ".models")
    sub.__path__ = [os.path.join(REF_ROOT, "v_diffusion", "models")]
    sub.__package__ = _PKG + ".models"
    sys.modules[_PKG + ".models"] = sub


def load(name: str):
    """load('diffusion') / load('functions') / load('modules') / load('models.unet')"""
    _ensure_pkg()
    full = f"{_PKG}.{name}"
    if full in sys.modules:
        return sys.modules[full]
    rel = name.replace(".", "/") + ".py"
    path = os.path.join(REF_ROOT, "v_diffusion", rel)
    spec = importlib.util.spec_from_file_location(full, path)
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = full.rsplit(".", 1)[0]
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod
