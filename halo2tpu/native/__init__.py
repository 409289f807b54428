"""Native host runtime (C++ via ctypes): keccak256 + the mock-prover gate
evaluator.  Built on demand with g++ and cached; every entry point has a
pure-Python fallback, so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "..", "..", ".cache", "libhostmath.so")
_SRC = os.path.join(_HERE, "hostmath.cpp")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                os.makedirs(os.path.dirname(_SO), exist_ok=True)
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            P64 = ctypes.POINTER(ctypes.c_uint64)
            lib.keccak256.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p]
            lib.fr_to_mont_batch.argtypes = [P64, ctypes.c_size_t]
            lib.mock_eval_poly.restype = ctypes.c_long
            lib.mock_eval_poly.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), P64, ctypes.c_size_t,
                P64, P64, ctypes.c_size_t, P64, ctypes.c_size_t,
                P64, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_long), ctypes.c_size_t]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def keccak256(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        from ..ops.keccak import keccak256 as py_keccak
        return py_keccak(data)
    out = ctypes.create_string_buffer(32)
    lib.keccak256(data, len(data), out)
    return out.raw


# ---------------------------------------------------------------------------
# Gate-evaluator bytecode (opcodes match hostmath.cpp)
# ---------------------------------------------------------------------------
OP_CONST, OP_FIXED, OP_ADVICE, OP_INSTANCE, OP_NEG, OP_ADD, OP_MUL = range(7)


def compile_expr(expr, constants: list) -> tuple[list[int], list[int]]:
    """Expression tree -> (ops, args) postfix; constants collected into
    `constants` (deduplicated), referenced by index."""
    from ..plonk.expression import (
        AdviceQuery, Constant, FixedQuery, InstanceQuery, Neg, Product, Sum,
    )
    ops: list[int] = []
    args: list[int] = []

    def emit(e):
        if isinstance(e, Constant):
            try:
                idx = constants.index(e.value)
            except ValueError:
                idx = len(constants)
                constants.append(e.value)
            ops.append(OP_CONST)
            args.append(idx)
        elif isinstance(e, (FixedQuery, AdviceQuery, InstanceQuery)):
            op = {FixedQuery: OP_FIXED, AdviceQuery: OP_ADVICE,
                  InstanceQuery: OP_INSTANCE}[type(e)]
            assert -128 <= e.rotation < 128
            ops.append(op)
            args.append((e.column_index << 8) | (e.rotation & 0xFF))
        elif isinstance(e, Neg):
            emit(e.expr)
            ops.append(OP_NEG)
            args.append(0)
        elif isinstance(e, Sum):
            emit(e.lhs)
            emit(e.rhs)
            ops.append(OP_ADD)
            args.append(0)
        elif isinstance(e, Product):
            emit(e.lhs)
            emit(e.rhs)
            ops.append(OP_MUL)
            args.append(0)
        else:  # pragma: no cover
            raise TypeError(type(e))

    emit(expr)
    return ops, args


def _to_u256_mont(values, lib) -> "object":
    """list/array of python ints -> numpy (n, 4) uint64 in Montgomery form."""
    import numpy as np
    n = len(values)
    buf = b"".join(int(v).to_bytes(32, "little") for v in values)
    arr = np.frombuffer(buf, dtype="<u8").reshape(n, 4).copy()
    lib.fr_to_mont_batch(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n)
    return arr


class NativeGateEvaluator:
    """Evaluates gate polynomials over all usable rows (MockProver hot
    loop).  Columns converted to Montgomery once, shared across polys."""

    def __init__(self, fixed_cols, advice_cols, instance_cols, nrows,
                 usable):
        import numpy as np
        lib = _load()
        assert lib is not None
        self.lib = lib
        self.nrows = nrows
        self.usable = usable

        def pack(cols):
            if not cols:
                return np.zeros((0,), dtype=np.uint64)
            flat = []
            for col in cols:
                flat.extend(int(v) for v in col)
            return _to_u256_mont(flat, lib)

        self.fixed = pack(fixed_cols)
        self.advice = pack(advice_cols)
        self.instance = pack(instance_cols)

    def eval_poly(self, expr, max_fail: int = 8) -> list[int]:
        """Returns rows (within usable) where the poly evaluates nonzero."""
        import numpy as np
        consts: list[int] = []
        ops, args = compile_expr(expr, consts)
        cst = _to_u256_mont(consts or [0], self.lib)
        ops_a = np.asarray(ops, dtype=np.uint32)
        args_a = np.asarray(args, dtype=np.uint64)
        fails = np.zeros(max_fail, dtype=np.int64)

        def ptr(a, ty=ctypes.c_uint64):
            return a.ctypes.data_as(ctypes.POINTER(ty))

        n = self.lib.mock_eval_poly(
            ptr(ops_a, ctypes.c_uint32), ptr(args_a), len(ops),
            ptr(cst),
            ptr(self.fixed), len(self.fixed),
            ptr(self.advice), len(self.advice),
            ptr(self.instance), len(self.instance),
            self.nrows, self.usable,
            ptr(fails, ctypes.c_long), max_fail)
        return [int(r) for r in fails[:n]]
