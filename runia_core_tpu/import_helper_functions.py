"""Optional-dependency import helper (reference runia_core/import_helper_functions.py)."""

from __future__ import annotations

import importlib
import types
from typing import Dict, List, Optional, Tuple, Union

__all__ = ["module_exists"]


def module_exists(
    *names: Union[List[str], str],
    error: str = "ignore",
    warn_every_time: bool = False,
    __INSTALLED_OPTIONAL_MODULES: Dict[str, bool] = {},
) -> Optional[Union[Tuple[types.ModuleType, ...], types.ModuleType]]:
    """Try to import optional dependencies with a raise/warn/ignore policy.

    Same contract as the reference (import_helper_functions.py:5-73): returns
    the module (or tuple of modules) if all are importable, else None (or
    raises / warns once per module, per the ``error`` policy).
    """
    assert error in {"raise", "warn", "ignore"}
    name_list: List[str] = list(names)
    modules = []
    for name in name_list:
        try:
            modules.append(importlib.import_module(name))
            __INSTALLED_OPTIONAL_MODULES[name] = True
        except ImportError:
            modules.append(None)

    def error_msg(missing):
        if not isinstance(missing, (list, tuple)):
            missing = [missing]
        missing_str = " ".join(f'"{name}"' for name in missing)
        dep_str = "dependency" if len(missing) == 1 else "dependencies"
        return f"Missing optional {dep_str} {missing_str}. Use pip or conda to install."

    missing_modules = [name for name, module in zip(name_list, modules) if module is None]
    if missing_modules:
        if error == "raise":
            raise ImportError(error_msg(missing_modules))
        if error == "warn":
            for name in missing_modules:
                if warn_every_time or name not in __INSTALLED_OPTIONAL_MODULES:
                    print(f"Warning: {error_msg(name)}")
                    __INSTALLED_OPTIONAL_MODULES[name] = False
        return None
    if len(modules) == 1:
        return modules[0]
    return tuple(modules)
