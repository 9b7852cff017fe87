"""Verbosity stack + rank-0 logging — the analogue of the reference's
printfQuda/warningQuda machinery with pushVerbosity/popVerbosity
(reference lib/util_quda.cpp, interface_quda.cpp:245, include/
util_quda.h): messages print on process 0 only, gated by a verbosity
level that callers push/pop around API calls, with an optional
per-scope output prefix (the reference's setOutputPrefix)."""

from __future__ import annotations

import contextlib
import enum
import sys


class Verbosity(enum.IntEnum):
    SILENT = 0
    SUMMARIZE = 1
    VERBOSE = 2
    DEBUG_VERBOSE = 3


_stack = [Verbosity.SUMMARIZE]
_prefix = [""]


def get_verbosity() -> Verbosity:
    return _stack[-1]


def set_verbosity(v: Verbosity):
    _stack[-1] = Verbosity(v)


@contextlib.contextmanager
def push_verbosity(v: Verbosity):
    """pushVerbosity/popVerbosity as a context manager."""
    _stack.append(Verbosity(v))
    try:
        yield
    finally:
        _stack.pop()


@contextlib.contextmanager
def output_prefix(p: str):
    _prefix.append(p)
    try:
        yield
    finally:
        _prefix.pop()


def _rank0() -> bool:
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


def log(msg: str, level: Verbosity = Verbosity.SUMMARIZE, file=None):
    """printfQuda: rank-0 print, gated by the current verbosity."""
    if get_verbosity() >= level and _rank0():
        print(f"{_prefix[-1]}{msg}", file=file or sys.stdout, flush=True)


def warn(msg: str):
    """warningQuda: always printed (rank 0), to stderr."""
    if _rank0():
        print(f"{_prefix[-1]}WARNING: {msg}", file=sys.stderr, flush=True)


def debug(msg: str):
    log(msg, Verbosity.DEBUG_VERBOSE)


def print_params(obj, name: str | None = None,
                 level: Verbosity = Verbosity.VERBOSE):
    """printQudaXParam analogue: dump any params dataclass field by
    field (the reference generates these printers from check_params.h's
    X-macro; dataclasses carry the same information intrinsically).
    Validation is the dataclass __post_init__, re-runnable via
    check_params()."""
    import dataclasses
    title = name or type(obj).__name__
    log(f"{title}:", level)
    for f in dataclasses.fields(obj):
        log(f"  {f.name} = {getattr(obj, f.name)!r}", level)


def check_params(obj):
    """checkQudaXParam analogue: re-run the dataclass validators on a
    possibly dataclasses.replace()'d instance."""
    import dataclasses
    post = getattr(obj, "__post_init__", None)
    if post is not None:
        post()
    return obj
