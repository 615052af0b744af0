"""Opt-in jaxtyping shape contracts for the public API.

The reference pins tensor shapes with torchtyping + typeguard
(sparse_gcm.py:72-92, @typechecked patch_typeguard usage). The TPU-native
analog annotates public signatures with jaxtyping axis-named types
(`Float[Array, "B t F"]`) and — when `gcm_tpu.config.TYPECHECK` is on —
enforces them at call time, including cross-argument axis consistency (the
part plain asserts can't express; axis names are bound in a shared memo by
jaxtyping's `jaxtyped` context).

Only jaxtyping array annotations are enforced; other annotations (state
NamedTuples, param pytrees, ints) are ignored — the bundled typeguard
(2.13.3) cannot evaluate py3.12 postponed annotations inside NamedTuples,
and duck-typed pytrees are not what shape contracts are for.

Checks run at Python call time, i.e. once per trace under jit — zero cost in
compiled execution, exactly like the reference's typeguard (which also only
fires per eager call). Off by default; enable with GCM_TYPECHECK=1 or
`gcm_tpu.config.TYPECHECK = True`.
"""

from __future__ import annotations

import functools
import inspect
import typing

_CACHE: dict = {}


def _array_anns(ann):
    """Yield the jaxtyping array members of an annotation (handles
    Optional/Union); returns [] if none, None-allowed flag separately."""
    from jaxtyping import AbstractArray

    members = typing.get_args(ann) if typing.get_origin(ann) in (
        typing.Union, getattr(__import__("types"), "UnionType", ())) else (ann,)
    arrays = [m for m in members
              if isinstance(m, type) and issubclass(m, AbstractArray)]
    allow_other = any(m not in arrays for m in members)
    return arrays, allow_other


def _lenient_checker(fn):
    """Validate jaxtyping-annotated params on call; ignore the rest."""
    sig = inspect.signature(fn)
    try:
        hints = typing.get_type_hints(fn)
    except Exception:
        hints = {}

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        bound = sig.bind(*args, **kwargs)
        for name, val in bound.arguments.items():
            ann = hints.get(name)
            if ann is None:
                continue
            arrays, allow_other = _array_anns(ann)
            if not arrays:
                continue
            if any(isinstance(val, a) for a in arrays):
                continue
            if allow_other and not hasattr(val, "shape"):
                continue  # e.g. Optional[...] given None
            expected = " | ".join(str(a) for a in arrays)
            got = (f"shape={tuple(val.shape)} dtype={val.dtype}"
                   if hasattr(val, "shape") else repr(val))
            raise TypeError(
                f"{fn.__qualname__}: parameter '{name}' violates shape "
                f"contract {expected}; got {got}. (Axis names are bound "
                f"consistently across this call's arguments.)")
        return fn(*args, **kwargs)

    return wrapper


def checked(fn):
    """Decorator: enforce the function's jaxtyping annotations when
    config.TYPECHECK is set; otherwise call through untouched."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        from gcm_tpu import config

        if not config.TYPECHECK:
            return fn(*args, **kwargs)
        if fn not in _CACHE:
            try:
                from jaxtyping import jaxtyped

                _CACHE[fn] = jaxtyped(typechecker=_lenient_checker)(fn)
            except ImportError:  # jaxtyping absent: no-op
                _CACHE[fn] = fn
        return _CACHE[fn](*args, **kwargs)

    return wrapper
