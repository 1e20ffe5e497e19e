"""Vectorized expression evaluation over device tables.

Analog of the reference's `evaluate_expressions` (reference
src/shared/shared.rs:18-22) — but where the reference delegates to DataFusion
PhysicalExprs over Arrow arrays, here expressions are a small AST evaluated
straight into jnp ops so XLA fuses them into the surrounding operator.

SQL three-valued logic is carried as (values, validity) pairs. String
predicates never touch strings on device: strings are dictionary codes, and
any predicate/function over a string column is precomputed on the host
dictionary into a sorted code set (`InCodes`) at plan time — dictionary values
are static, so LIKE/substring/IN all become integer set-membership on device.

Dictionaries are kept LEXICOGRAPHICALLY SORTED at ingest, so code order ==
string order; ORDER BY and min/max on strings operate directly on codes.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.columnar import (DType, Kind, INT32, INT64, FLOAT64, BOOL,
                              DATE32, STRING, DeviceTable)

Arr = jnp.ndarray
EvalResult = Tuple[Arr, Arr, DType]  # values, validity, logical type


def _as_float(vals: Arr, dt: DType) -> Arr:
    if dt.kind is Kind.DECIMAL:
        return vals.astype(jnp.float64) / (10.0 ** dt.scale)
    return vals.astype(jnp.float64)


def _promote(lv: Arr, ldt: DType, rv: Arr, rdt: DType) -> Tuple[Arr, Arr, DType]:
    """Numeric promotion; decimals and mixed int/float go to float64."""
    if ldt == rdt and ldt.kind is not Kind.DECIMAL:
        return lv, rv, ldt
    num_f = (Kind.FLOAT32, Kind.FLOAT64, Kind.DECIMAL)
    if ldt.kind in num_f or rdt.kind in num_f:
        return _as_float(lv, ldt), _as_float(rv, rdt), FLOAT64
    # integer-family (int32/int64/date32)
    wide = jnp.promote_types(lv.dtype, rv.dtype)
    out = INT64 if wide == jnp.int64 else (DATE32 if Kind.DATE32 in (ldt.kind, rdt.kind) else INT32)
    return lv.astype(wide), rv.astype(wide), out


_MAX_DECIMAL_SCALE = 4


def _decimal_arith(op, lv, ldt, rv, rdt):
    """Exact decimal +,-,* in the scaled int64 domain (TPC-H money math).

    Result scale is bounded by _MAX_DECIMAL_SCALE (int64 headroom for 6M-row
    sums); wider products fall through to float64. Division always floats.
    """
    from ..utils.columnar import DECIMAL as _DEC
    kinds = (ldt.kind, rdt.kind)
    ints = (Kind.INT32, Kind.INT64)
    if Kind.DECIMAL not in kinds or op not in ("+", "-", "*"):
        return None
    if not all(k is Kind.DECIMAL or k in ints for k in kinds):
        return None
    ls = ldt.scale if ldt.kind is Kind.DECIMAL else 0
    rs = rdt.scale if rdt.kind is Kind.DECIMAL else 0
    a = lv.astype(jnp.int64)
    b = rv.astype(jnp.int64)
    if op == "*":
        if ls + rs > _MAX_DECIMAL_SCALE:
            return None
        return a * b, _DEC(ls + rs)
    s = max(ls, rs)
    if s > _MAX_DECIMAL_SCALE:
        return None
    a = a * (10 ** (s - ls))
    b = b * (10 ** (s - rs))
    return (a + b if op == "+" else a - b), _DEC(s)


class Expr:
    def eval(self, t: DeviceTable) -> EvalResult:
        raise NotImplementedError

    def __repr__(self):
        return self.__class__.__name__


@dataclass(repr=False)
class Col(Expr):
    name: str

    def eval(self, t):
        v, valid = t.column(self.name)
        return v, valid, t.schema.field(self.name).dtype

    def __repr__(self):
        return self.name


@dataclass(repr=False)
class Lit(Expr):
    value: object            # python scalar or None
    dtype: DType
    raw: bool = False        # DECIMAL only: value is already in scaled units

    def eval(self, t):
        cap = t.capacity
        if self.value is None:
            return (jnp.zeros((cap,), self.dtype.device_dtype),
                    jnp.zeros((cap,), jnp.bool_), self.dtype)
        raw = self.value
        if self.dtype.kind is Kind.DECIMAL and not self.raw:
            raw = int(round(float(raw) * 10 ** self.dtype.scale))
        v = jnp.full((cap,), raw, dtype=self.dtype.device_dtype)
        return v, jnp.ones((cap,), jnp.bool_), self.dtype

    def __repr__(self):
        return f"lit({self.value})"


_CMP = {"=": jnp.equal, "<>": jnp.not_equal, "<": jnp.less, "<=": jnp.less_equal,
        ">": jnp.greater, ">=": jnp.greater_equal}
_ARITH = ("+", "-", "*", "/", "%")


@dataclass(repr=False)
class BinOp(Expr):
    op: str
    left: Expr
    right: Expr

    def eval(self, t):
        lv, lval, ldt = self.left.eval(t)
        rv, rval, rdt = self.right.eval(t)
        op = self.op
        if op in ("and", "or"):
            # three-valued logic; invalid operands read as the identity value
            la = jnp.where(lval, lv.astype(jnp.bool_), op == "and")
            ra = jnp.where(rval, rv.astype(jnp.bool_), op == "and")
            if op == "and":
                v = la & ra
                valid = (lval & rval) | (lval & ~lv.astype(jnp.bool_)) | (rval & ~rv.astype(jnp.bool_))
            else:
                v = la | ra
                valid = (lval & rval) | (lval & lv.astype(jnp.bool_)) | (rval & rv.astype(jnp.bool_))
            return v, valid, BOOL
        valid = lval & rval
        if op in _CMP:
            if ldt.kind is Kind.STRING or rdt.kind is Kind.STRING:
                # string vs string column compare: only valid when both share a
                # dictionary (codes are order-isomorphic); planner guarantees it
                v = _CMP[op](lv, rv)
                return v, valid, BOOL
            if ldt.kind is Kind.DECIMAL and rdt.kind is Kind.DECIMAL \
                    and ldt.scale == rdt.scale:
                # exact: same-scale decimals compare in raw integer units
                # (float conversion is unsafe — XLA division is not
                # correctly rounded on all backends)
                return _CMP[op](lv, rv), valid, BOOL
            if ldt.kind is Kind.DECIMAL and rdt.kind in (Kind.INT32, Kind.INT64):
                b = rv.astype(jnp.int64) * (10 ** ldt.scale)
                return _CMP[op](lv.astype(jnp.int64), b), valid, BOOL
            if rdt.kind is Kind.DECIMAL and ldt.kind in (Kind.INT32, Kind.INT64):
                a = lv.astype(jnp.int64) * (10 ** rdt.scale)
                return _CMP[op](a, rv.astype(jnp.int64)), valid, BOOL
            a, b, _ = _promote(lv, ldt, rv, rdt)
            return _CMP[op](a, b), valid, BOOL
        if op in _ARITH:
            d = _decimal_arith(op, lv, ldt, rv, rdt)
            if d is not None:
                v, dt = d
                return v, valid, dt
            a, b, dt = _promote(lv, ldt, rv, rdt)
            if op == "+":
                v = a + b
            elif op == "-":
                v = a - b
            elif op == "*":
                v = a * b
            elif op == "/":
                if dt.kind in (Kind.INT32, Kind.INT64):
                    bz = jnp.where(b == 0, 1, b)
                    v = jnp.where(valid & (b != 0), a // bz, 0)
                    valid = valid & (b != 0)
                else:
                    bz = jnp.where(b == 0, 1.0, b)
                    v = a / bz
                    valid = valid & (b != 0)
            else:  # %
                bz = jnp.where(b == 0, 1, b)
                v = a % bz
                valid = valid & (b != 0)
            return v, valid, dt
        raise ValueError(f"unknown op {op}")

    def __repr__(self):
        return f"({self.left} {self.op} {self.right})"


@dataclass(repr=False)
class Not(Expr):
    child: Expr

    def eval(self, t):
        v, valid, _ = self.child.eval(t)
        return ~v.astype(jnp.bool_), valid, BOOL


@dataclass(repr=False)
class IsNull(Expr):
    child: Expr
    negated: bool = False

    def eval(self, t):
        _, valid, _ = self.child.eval(t)
        v = valid if self.negated else ~valid
        return v, jnp.ones_like(valid), BOOL


@dataclass(repr=False)
class Cast(Expr):
    child: Expr
    to: DType

    def eval(self, t):
        v, valid, dt = self.child.eval(t)
        if dt == self.to:
            return v, valid, dt
        if self.to.kind in (Kind.FLOAT32, Kind.FLOAT64):
            return _as_float(v, dt).astype(self.to.device_dtype), valid, self.to
        if self.to.kind is Kind.DECIMAL:
            f = _as_float(v, dt) * (10 ** self.to.scale)
            return jnp.round(f).astype(jnp.int64), valid, self.to
        return v.astype(self.to.device_dtype), valid, self.to


@dataclass(repr=False)
class InCodes(Expr):
    """Set membership against a static sorted int array (string predicates,
    integer IN-lists). `codes` is host data baked into the program."""
    child: Expr
    codes: np.ndarray
    negated: bool = False

    def eval(self, t):
        v, valid, _ = self.child.eval(t)
        codes = jnp.asarray(np.sort(np.asarray(self.codes)))
        if codes.shape[0] == 0:
            member = jnp.zeros(v.shape, jnp.bool_)
        else:
            pos = jnp.searchsorted(codes, v.astype(codes.dtype))
            pos = jnp.minimum(pos, codes.shape[0] - 1)
            member = jnp.take(codes, pos) == v.astype(codes.dtype)
        out = ~member if self.negated else member
        return out, valid, BOOL


@dataclass(repr=False)
class Case(Expr):
    whens: List[Tuple[Expr, Expr]]
    otherwise: Optional[Expr] = None

    def eval(self, t):
        branches = [(c.eval(t), v.eval(t)) for c, v in self.whens]
        if self.otherwise is not None:
            ev, evalid, edt = self.otherwise.eval(t)
        else:
            _, _, edt = branches[0][1]
            ev = jnp.zeros((t.capacity,), edt.device_dtype)
            evalid = jnp.zeros((t.capacity,), jnp.bool_)
        out_v, out_valid = ev, evalid
        # fold in reverse so the FIRST matching when wins
        for (cv, cvalid, _), (vv, vvalid, vdt) in reversed(branches):
            hit = cvalid & cv.astype(jnp.bool_)
            if vv.dtype != out_v.dtype:
                wide = jnp.promote_types(vv.dtype, out_v.dtype)
                vv, out_v = vv.astype(wide), out_v.astype(wide)
            out_v = jnp.where(hit, vv, out_v)
            out_valid = jnp.where(hit, vvalid, out_valid)
        _, _, vdt = branches[0][1]
        return out_v, out_valid, vdt


@dataclass(repr=False)
class ExtractDatePart(Expr):
    """EXTRACT(YEAR|MONTH|DAY FROM date32) via the civil-calendar algorithm —
    pure int arithmetic, VPU-friendly."""
    part: str  # 'year' | 'month' | 'day'
    child: Expr

    def eval(self, t):
        v, valid, _ = self.child.eval(t)
        z = v.astype(jnp.int32) + 719468
        era = jnp.floor_divide(z, 146097)
        doe = z - era * 146097
        yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
        y = yoe + era * 400
        doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
        mp = (5 * doy + 2) // 153
        d = doy - (153 * mp + 2) // 5 + 1
        m = mp + jnp.where(mp < 10, 3, -9)
        y = y + (m <= 2)
        out = {"year": y, "month": m, "day": d}[self.part]
        return out.astype(jnp.int32), valid, INT32


@dataclass(repr=False)
class Coalesce(Expr):
    children: List[Expr]

    def eval(self, t):
        rs = [c.eval(t) for c in self.children]
        out_v, out_valid, dt = rs[-1]
        for v, valid, vdt in reversed(rs[:-1]):
            if v.dtype != out_v.dtype:
                wide = jnp.promote_types(v.dtype, out_v.dtype)
                v, out_v = v.astype(wide), out_v.astype(wide)
            out_v = jnp.where(valid, v, out_v)
            out_valid = valid | out_valid
            dt = vdt
        return out_v, out_valid, dt
