"""Ray interop helpers.

``register_for_ray`` makes every loaded ``anno_ray`` module pickle-by-value,
so kernel closures shipped to Ray workers carry the code with them and the
package does not need to be installed / on PYTHONPATH inside workers. Called
idempotently by every stage factory. (On a real cluster you would also ship
the package via ``runtime_env={"py_modules": [...]}`` — by-value pickling
keeps local mode and the driver contract zero-config.)
"""

from __future__ import annotations

import sys

_registered: set[str] = set()


def register_for_ray() -> None:
    picklers = []
    try:
        from ray import cloudpickle as ray_cp  # Ray ships a vendored copy

        picklers.append(ray_cp)
    except ImportError:  # pragma: no cover
        pass
    try:
        import cloudpickle

        picklers.append(cloudpickle)
    except ImportError:  # pragma: no cover
        pass

    for name, mod in list(sys.modules.items()):
        if mod is None:
            continue
        if name == "anno_ray" or name.startswith("anno_ray."):
            if name not in _registered:
                for cp in picklers:
                    try:
                        cp.register_pickle_by_value(mod)
                    except Exception:
                        pass
                _registered.add(name)
