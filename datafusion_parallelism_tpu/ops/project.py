"""Projection: evaluate expressions into a new table (XLA fuses these into
neighbouring operators; analog of the reference's ProjectionExec wrapping,
reference src/operator/use_parallel_hash_join_rule.rs:108-131)."""

from __future__ import annotations

from typing import List, Tuple

from ..utils.columnar import DeviceTable, Field, Kind, Schema
from .expressions import Col, Expr


def project_table(t: DeviceTable, exprs: List[Tuple[Expr, str]],
                  out_fields: List[Field] = None) -> DeviceTable:
    """out_fields: plan-time fields (dtype/dictionary authority — runtime
    eval cannot see dictionaries of computed string exprs like substring)."""
    fields, cols = [], {}
    for i, (e, name) in enumerate(exprs):
        v, valid, dt = e.eval(t)
        if out_fields is not None:
            fields.append(out_fields[i])
        else:
            dictionary = None
            if isinstance(e, Col) and dt.kind is Kind.STRING:
                dictionary = t.schema.field(e.name).dictionary
            fields.append(Field(name, dt, nullable=True, dictionary=dictionary))
        cols[name] = (v, valid)
    return DeviceTable(Schema(fields), cols, t.num_rows)
