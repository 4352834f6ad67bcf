"""Operator library — one module per SURVEY.md §2 tier.

Importing this package imports every tier module so their ``@query``
decorators populate the registry.
"""

import importlib
import pkgutil

for _mod in pkgutil.iter_modules(__path__):
    importlib.import_module(f"{__name__}.{_mod.name}")
