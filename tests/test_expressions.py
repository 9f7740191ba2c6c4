from __future__ import annotations

import pytest

from raise_featurestore_spark.catalog.lineage import (
    CycleError,
    InvalidReferenceError,
    LineageGraph,
    parse_reference,
)
from raise_featurestore_spark.expressions.validator import validate_expression


class TestReferencePaths:
    def test_local(self):
        r = parse_reference("revenue")
        assert r.feature == "revenue" and r.is_local

    def test_versioned(self):
        r = parse_reference("revenue@v2")
        assert r.version == "v2"

    def test_group(self):
        r = parse_reference("user-signals.embedding")
        assert r.group == "user-signals" and r.feature == "embedding"

    def test_project_group(self):
        r = parse_reference("recsys/items.item_embedding")
        assert r.project == "recsys" and r.group == "items"

    def test_domain_project_group(self):
        r = parse_reference("ml/recsys/items.price")
        assert r.domain == "ml" and r.project == "recsys" and r.group == "items"

    def test_cross_org(self):
        r = parse_reference("@acme/ml/recsys/items.price")
        assert r.org == "acme" and r.domain == "ml"

    @pytest.mark.parametrize("bad", ["@acme/items.price", "a/b/c/d/e.f", "ml/recsys/price"])
    def test_invalid(self, bad):
        with pytest.raises(InvalidReferenceError):
            parse_reference(bad)


class TestValidator:
    def test_empty(self):
        r = validate_expression("   ")
        assert not r.valid and r.errors[0].code == "EMPTY_EXPRESSION"

    def test_unbalanced(self):
        r = validate_expression("ABS(x", known_features={"x"})
        assert any(e.code == "UNBALANCED_PARENS" for e in r.errors)

    def test_unknown_function(self):
        r = validate_expression("FROBNICATE(x)", known_features={"x"})
        assert any(e.code == "UNKNOWN_FUNCTION" for e in r.errors)

    def test_unknown_function_suggestion(self):
        r = validate_expression("COSINE_SIM(a, b)", known_features={"a", "b"})
        msg = [e for e in r.errors if e.code == "UNKNOWN_FUNCTION"][0].message
        assert "COSINE_SIMILARITY" in msg

    def test_unknown_reference(self):
        r = validate_expression("revenu * 2", known_features={"revenue"})
        assert any(e.code == "UNKNOWN_REFERENCE" for e in r.errors)
        assert "revenue" in r.errors[0].message  # suggestion

    def test_permissive_downgrades(self):
        r = validate_expression("revenu * 2", known_features={"revenue"}, level="permissive")
        assert r.valid and r.warnings

    def test_division_warning(self):
        r = validate_expression("a / b", known_features={"a", "b"})
        assert r.valid and any(w.code == "DIVISION_BY_ZERO" for w in r.warnings)
        r2 = validate_expression("a / NULLIF(b, 0)", known_features={"a", "b"})
        assert not any(w.code == "DIVISION_BY_ZERO" for w in r2.warnings)

    def test_references_extracted(self):
        r = validate_expression(
            "DOT(user_embedding, item-signals.item_embedding)",
            known_features={"user_embedding"},
        )
        assert r.valid
        feats = {ref.feature for ref in r.references}
        assert feats == {"user_embedding", "item_embedding"}

    def test_keywords_and_literals_skipped(self):
        r = validate_expression(
            "CASE WHEN tier = 'gold' THEN amount * 2 ELSE amount END",
            known_features={"tier", "amount"},
        )
        assert r.valid, r.errors

    def test_window_expression(self):
        r = validate_expression(
            "SUM(revenue) OVER (PARTITION BY user_id ORDER BY ts ROWS 7 PRECEDING)",
            known_features={"revenue", "user_id", "ts"},
        )
        assert r.valid, r.errors


class TestLineage:
    def test_transitive(self):
        g = LineageGraph()
        g.add("c", {"b"})
        g.add("b", {"a"})
        assert g.all_upstream("c") == {"a", "b"}
        assert g.all_downstream("a") == {"b", "c"}

    def test_cycle_detection(self):
        g = LineageGraph()
        g.add("b", {"a"})
        g.add("c", {"b"})
        with pytest.raises(CycleError):
            g.add("a", {"c"})
        with pytest.raises(CycleError):
            g.add("x", {"x"})


def test_unspaced_arithmetic_and_scientific_literals(spark):
    """Regression: '-' and '/' are path-reference characters, but a DOTLESS
    token containing them is unspaced arithmetic; exponent literals lex as
    one number (not number + bogus 'e3' reference)."""
    from raise_featurestore_spark.expressions.compiler import compile_expression
    from raise_featurestore_spark.expressions.validator import validate_expression

    r = validate_expression("clicks/impressions", known_features={"clicks", "impressions"})
    assert r.valid, [i.message for i in r.errors]
    r2 = validate_expression("price-cost", known_features={"price", "cost"})
    assert r2.valid
    r3 = validate_expression("x * 1.5e3", known_features={"x"})
    assert r3.valid
    # dotted names keep path-reference semantics
    r4 = validate_expression("item-signals.item_embedding")
    assert r4.valid and r4.reference_strings == ["?/?/?/item-signals/item_embedding"]
    df = spark.createDataFrame([(10.0, 4.0)], "price double, cost double")
    _, col = compile_expression(df, "price-cost")
    assert df.select(col.alias("m")).first().m == 6.0


def test_hoisted_aggregate_does_not_clobber_windowed_twin(spark):
    """Regression: hoisting rewrote by str.replace, clobbering a textually
    identical WINDOWED aggregate; spans are spliced individually now."""
    from raise_featurestore_spark.expressions.compiler import compile_expression

    df = spark.createDataFrame(
        [(1, 1.0), (1, 3.0), (2, 5.0)], "g int, x double"
    )
    d2, col = compile_expression(df, "AVG(x) - AVG(x) OVER (PARTITION BY g)")
    got = sorted(round(r.v, 6) for r in d2.select(col.alias("v")).collect())
    assert got == [-2.0, 1.0, 1.0]  # global 3.0 minus group means 2.0/2.0/5.0
