"""Component registries: the dlopen-plugin system, re-designed.

The reference discovers functionality by loading shared libraries named
``libgslam_<name>.so`` (``GSLAM/core/SharedLibrary.h`` + Svar's Registry)
and dispatches datasets on the dataset-path *extension*
(``REGISTER_DATASET(Class, "ext")`` in ``GSLAM/core/Dataset.h``).  Here a
plugin is a registry entry: a name -> factory mapping with decorator
registration.  Extension dispatch for datasets is preserved verbatim.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Optional, Tuple


class Registry:
    """Name -> factory registry with decorator registration."""

    def __init__(self, kind: str):
        self.kind = kind
        self._factories: Dict[str, Callable[..., Any]] = {}

    def register(self, name: str) -> Callable[[Callable[..., Any]], Callable[..., Any]]:
        def deco(factory: Callable[..., Any]) -> Callable[..., Any]:
            key = name.lower()
            if key in self._factories:
                raise KeyError(f"{self.kind} {name!r} already registered")
            self._factories[key] = factory
            return factory

        return deco

    def create(self, name: str, *args: Any, **kw: Any) -> Any:
        key = name.lower()
        if key not in self._factories:
            raise KeyError(
                f"no {self.kind} named {name!r}; have {sorted(self._factories)}")
        return self._factories[key](*args, **kw)

    def get(self, name: str) -> Optional[Callable[..., Any]]:
        return self._factories.get(name.lower())

    def __contains__(self, name: str) -> bool:
        return name.lower() in self._factories

    def __iter__(self) -> Iterator[Tuple[str, Callable[..., Any]]]:
        return iter(self._factories.items())

    def names(self):
        return sorted(self._factories)


#: datasets register by path extension ("tumrgbd", "kitti", "euroc", ...),
#: mirroring REGISTER_DATASET; see gslam_tpu.datasets.
DATASETS = Registry("dataset")
#: robust multi-view estimators (reference Estimator::create()).
ESTIMATORS = Registry("estimator")
#: nonlinear optimizers (reference Optimizer::create()).
OPTIMIZERS = Registry("optimizer")
#: SLAM systems (reference createSLAMInstance / SLAM plugin contract).
SLAMS = Registry("slam")
#: CLI apps (reference's Svar-registered "apps": qviz/play/tests).
APPS = Registry("app")


def open_dataset(path: str, *args: Any, **kw: Any) -> Any:
    """Extension dispatch: ``Dataset::open(path)`` analog.

    ``/data/kitti/00.kitti`` -> the dataset registered under ``"kitti"``.
    """
    import gslam_tpu.datasets  # noqa: F401 — populate registry (the
    # reference dlopens libgslam_<ext>.so on demand; we import-on-demand)

    ext = path.rsplit(".", 1)[-1].lower() if "." in path else path.lower()
    ds = DATASETS.create(ext)
    ds.open(path, *args, **kw)
    return ds
