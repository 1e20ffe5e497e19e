"""SQL parser unit tests."""

import pytest

from datafusion_parallelism_tpu.models.sql_parser import parse_sql
from datafusion_parallelism_tpu.models.sql_ast import (EBinary, EExists,
                                                       EInSubquery, EInterval,
                                                       ELike, EUnary)


def test_basic_select():
    s = parse_sql("SELECT a, b AS bb FROM t WHERE a > 1 ORDER BY bb DESC LIMIT 3")
    assert len(s.projections) == 2
    assert s.projections[1][1] == "bb"
    assert s.limit == 3
    assert not s.order_by[0].ascending


def test_join_kinds():
    s = parse_sql("SELECT * FROM a JOIN b ON a.x = b.x "
                  "LEFT JOIN c ON b.y = c.y FULL OUTER JOIN d ON c.z = d.z")
    assert [j.kind for j in s.joins] == ["inner", "left", "full"]


def test_exists_and_not_exists():
    s = parse_sql("SELECT * FROM t WHERE EXISTS (SELECT * FROM u WHERE u.a = t.a)")
    assert isinstance(s.where, EExists)
    s2 = parse_sql("SELECT * FROM t WHERE NOT EXISTS (SELECT * FROM u WHERE u.a = t.a)")
    assert isinstance(s2.where, EUnary) and isinstance(s2.where.child, EExists)


def test_in_subquery_negated():
    s = parse_sql("SELECT * FROM t WHERE x NOT IN (SELECT y FROM u)")
    assert isinstance(s.where, EInSubquery) and s.where.negated


def test_interval_variants():
    s1 = parse_sql("SELECT * FROM t WHERE d < date '1995-01-01' + interval '1' year")
    s2 = parse_sql("SELECT * FROM t WHERE d < date '1995-01-01' + interval '3 month'")
    assert isinstance(s1.where.right.right, EInterval)
    assert s2.where.right.right.unit == "month"


def test_string_escapes_and_like():
    s = parse_sql("SELECT * FROM t WHERE a LIKE '%promo%' AND b = 'it''s'")
    conj = s.where
    assert isinstance(conj, EBinary) and conj.op == "and"
    assert isinstance(conj.left, ELike)
    assert conj.right.right.value == "it's"


def test_operator_precedence():
    s = parse_sql("SELECT * FROM t WHERE a + b * c - d < 2 OR e = 1 AND f = 2")
    # or(|, and(=,=)) at top
    assert s.where.op == "or"
    assert s.where.right.op == "and"
    lhs = s.where.left
    assert lhs.op == "<"
    assert lhs.left.op == "-"            # (a + b*c) - d
    assert lhs.left.left.op == "+"
    assert lhs.left.left.right.op == "*"


def test_case_with_operand():
    s = parse_sql("SELECT CASE x WHEN 1 THEN 10 ELSE 0 END FROM t")
    case = s.projections[0][0]
    assert case.whens[0][0].op == "="


def test_errors():
    with pytest.raises(SyntaxError):
        parse_sql("SELECT FROM t")
    with pytest.raises(SyntaxError):
        parse_sql("SELECT a FROM t WHERE")
    with pytest.raises(SyntaxError):
        parse_sql("SELECT a FROM t GROUP a")
