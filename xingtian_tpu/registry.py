"""Name → factory registry for the four composable blocks (+ comm/kernels).

Capability parity with the reference's ``Registers.{agent,model,algorithm,
env,comm}`` class-property registry and its auto-import machinery
(reference ``zeus/common/util/register.py:39-200``).  Differences, by
design:

* registration is explicit (decorators at module import), not glob-driven;
* lookup failures raise with the list of known names instead of a deferred
  diagnostics dict;
* user modules register by simply importing their package before building a
  config (the reference instead appends CWD to ``sys.path`` and imports
  every ``*.py`` it can find, ``register.py:168-200``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Optional


class Registry:
    """A single named namespace of factories."""

    def __init__(self, name: str):
        self.name = name
        self._entries: Dict[str, Any] = {}

    def register(self, obj: Any = None, *, name: Optional[str] = None, aliases: tuple = ()):
        """Register ``obj`` under ``name`` (default: class/function __name__).

        Usable as ``@REG.register``, ``@REG.register(name="X")`` or
        ``REG.register(obj, name="X")``.
        """
        if obj is None:
            def deco(o):
                return self.register(o, name=name, aliases=aliases)
            return deco
        key = name or getattr(obj, "__name__", None)
        if not key:
            raise ValueError(f"cannot infer a registry name for {obj!r}")
        for k in (key, *aliases):
            if k in self._entries and self._entries[k] is not obj:
                raise KeyError(f"{self.name} registry already has an entry for {k!r}")
            self._entries[k] = obj
        return obj

    def get(self, name: str) -> Any:
        try:
            return self._entries[name]
        except KeyError:
            known = ", ".join(sorted(self._entries)) or "<empty>"
            raise KeyError(
                f"unknown {self.name} {name!r}; registered: {known}"
            ) from None

    def build(self, name: str, /, *args, **kwargs) -> Any:
        """Instantiate the registered factory."""
        return self.get(name)(*args, **kwargs)

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def __iter__(self) -> Iterator[str]:
        return iter(self._entries)

    def names(self):
        return sorted(self._entries)


class Registers:
    """The framework-wide registries (reference ``register.py:72-82``)."""

    env = Registry("env")
    model = Registry("model")
    algorithm = Registry("algorithm")
    agent = Registry("agent")
    comm = Registry("comm")
    # host-side (non-JAX) simulator protocol classes for the env farms
    host_env = Registry("host_env")


def env_builder(name: str, /, *args, **kwargs):
    return Registers.env.build(name, *args, **kwargs)


def model_builder(name: str, /, *args, **kwargs):
    return Registers.model.build(name, *args, **kwargs)


def alg_builder(name: str, /, *args, **kwargs):
    return Registers.algorithm.build(name, *args, **kwargs)


def agent_builder(name: str, /, *args, **kwargs):
    return Registers.agent.build(name, *args, **kwargs)
