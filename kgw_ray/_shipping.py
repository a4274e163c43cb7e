"""Make kgw_ray code shippable to Ray workers regardless of driver cwd.

Ray worker processes resolve task/actor closures by importing their defining
module. When the driver process was started outside the repo (the harness
does its own ``ray.init`` before importing ``__ray_entry__``), workers cannot
import ``kgw_ray`` and every stage fails with ModuleNotFoundError.

Fix: eagerly import every kgw_ray submodule, then register them with
cloudpickle for pickle-BY-VALUE — closures ship the code itself instead of a
module reference. The library is small, so the per-closure overhead is noise.
"""

from __future__ import annotations

import importlib
import pkgutil
import sys

_DONE = False


def ensure_importable_in_workers() -> None:
    global _DONE
    if _DONE:
        return
    import kgw_ray

    for info in pkgutil.walk_packages(kgw_ray.__path__, prefix="kgw_ray."):
        try:
            importlib.import_module(info.name)
        except ImportError:  # pragma: no cover - optional deps
            pass
    try:
        from ray import cloudpickle
    except ImportError:  # pragma: no cover
        _DONE = True
        return
    for name, mod in list(sys.modules.items()):
        if mod is not None and (name == "kgw_ray" or name.startswith("kgw_ray.")):
            try:
                cloudpickle.register_pickle_by_value(mod)
            except Exception:  # pragma: no cover
                pass
    _DONE = True
