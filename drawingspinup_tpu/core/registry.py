"""Name → class registries.

The reference uses per-package registry dicts with ``@register`` decorators
(``instant_nsr/{datasets,systems,models}/__init__.py``). Here a single generic
``Registry`` serves datasets, systems, models, generators and discriminators.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Generic, Optional, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    def __init__(self, kind: str):
        self.kind = kind
        self._items: Dict[str, T] = {}

    def register(self, name: str) -> Callable[[T], T]:
        def deco(obj: T) -> T:
            if name in self._items:
                raise KeyError(f"{self.kind} {name!r} already registered")
            self._items[name] = obj
            return obj

        return deco

    def get(self, name: str) -> T:
        try:
            return self._items[name]
        except KeyError:
            known = ", ".join(sorted(self._items))
            raise KeyError(f"unknown {self.kind} {name!r}; known: {known}") from None

    def make(self, name: str, *args: Any, **kw: Any) -> Any:
        return self.get(name)(*args, **kw)

    def __contains__(self, name: str) -> bool:
        return name in self._items

    def names(self):
        return sorted(self._items)


MODELS: Registry = Registry("model")
SYSTEMS: Registry = Registry("system")
DATASETS: Registry = Registry("dataset")
GENERATORS: Registry = Registry("generator")
DISCRIMINATORS: Registry = Registry("discriminator")
