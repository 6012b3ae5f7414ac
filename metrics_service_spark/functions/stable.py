"""Comparison-stable rounding: exact integer arithmetic on both engines.

Why this module exists (the r8 driver-red row): ``round()`` on a DOUBLE
is engine/build dependent exactly at representable half-boundaries.
``doc_dup_spans`` went hash-red with rows+schema green because one doc
had dup_frac = 31/32 = 0.96875 — a dyadic rational that is EXACTLY half
at 4 decimals — and Spark (BigDecimal HALF_UP over the double's exact
decimal expansion) vs the driver's DuckDB build (``x * 10^s`` then a
libm-rounded ``round``) resolved the tie in opposite directions.  Any
rounded ratio-of-integers emitted into a hash-compared column is one
fixture re-roll away from the same red: ratios of counts land on dyadic
half-boundaries all the time (1/2, 3/16, 31/32 ...).

Fix: never round a double.  Round-half-up of ``num/den`` at ``scale``
decimals is computed in exact integer arithmetic

    q     = (2 * 10^s * num + den)  div  (2 * den)      -- exact ints
    value = q / 10^s                                    -- ONE correctly
                                                        -- rounded IEEE
                                                        -- division

``q`` is exact on both engines; the final division of the same two
integers is bit-identical under IEEE-754, so the emitted double is
bit-identical everywhere.  The intermediate runs in DECIMAL(38,0) on
Spark and HUGEINT (int128) in the DuckDB oracle so ``2*10^s*num``
cannot overflow int64 even for 100 TB-scale decimal sums.

Negative numerators are handled by computing on ``abs(num)`` and
re-applying the sign (round-half-AWAY, matching both engines' positive
half-up), because DuckDB's ``//`` truncates toward zero while Spark's
``a - pmod(a, b)`` floors — they only agree on non-negative operands.

Contract: ``num`` integral (BIGINT or an integral-valued DECIMAL, e.g.
a DECIMAL(18,2) sum pre-multiplied by 100), ``den > 0`` integral, and
the true quotient ``q = round(10^s * |num|/den)`` below 2^53 (i.e. the
rounded VALUE below ~9e11 at scale 4) so the final double is exact.
NULL num/den propagate to NULL on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "round_frac",
    "round_frac_bigint",
    "round_frac_int",
    "sql_round_frac",
    "sql_round_frac_bigint",
    "sql_round_frac_int",
]


#: Enforced integrity guard (ADVICE r9).  Deliberately looser than
#: the documented < 2^53 VALUE-exactness bound: above 2^53 the
#: emitted double is no longer the exact decimal but remains
#: BIT-IDENTICAL across engines (both sides compute the same exact
#: integer ``q`` and int->double casts are correctly-rounded IEEE on
#: Spark and DuckDB alike — covered by the (10^14, 7) bitwise test
#: case), so hash comparison is still safe.  What the guard converts
#: from SILENT divergence into an ERROR is overflow-as-NULL: without
#: ANSI, a decimal(38,0) product / decimal(38,6) quotient / BIGINT
#: cast that overflows emits NULL while DuckDB's HUGEINT keeps going
#: — a hash-surface split the NULL contract would mask.  (Under ANSI,
#: Spark raises its own overflow error first; the guard is the
#: non-ANSI backstop.)
_MAX_Q_LONG = 2**63


def _check_q(
    q: Column, num: Column, den: Column, ctx: str, bound: int | None
) -> Column:
    """Jobless per-row guard (same fused ``assert_true`` idiom as
    ``percentile_buckets``): a NULL quotient from NON-NULL inputs is
    an overflow, not data — fail instead of emitting it.  ``bound``
    additionally rejects quotients the downstream cast cannot hold
    (2^63 for the BIGINT path; None for the double path, whose own
    decimal type already cannot represent an out-of-headroom value).
    NULL num/den still propagate per the NULL contract."""
    ok = q.isNotNull() | num.isNull() | den.isNull()
    if bound is not None:
        # the bound exceeds a JVM long literal — route the constant
        # through a string cast (constant-folded, no per-row cost).
        # Two-sided (ADVICE r10): a quotient <= -2^63 from a negative
        # numerator would ALSO cast to a silent NULL long under
        # non-ANSI — reject both overflow directions, not just the
        # positive one.
        ok = ok & (
            q.isNull()
            | (
                (q < F.expr(f"cast('{bound}' as decimal(38,0))"))
                & (q > F.expr(f"cast('{-bound}' as decimal(38,0))"))
            )
        )
    guard = F.assert_true(
        ok,
        F.lit(
            f"{ctx}: rounded quotient overflowed the engine-safe integer "
            "range (see functions/stable.py contract); lower `scale` or "
            "pre-reduce the ratio"
        ),
    )
    return F.when(guard.isNull(), q)


def round_frac(num: Column, den: Column, scale: int = 4) -> Column:
    """Deterministic round-half-up of ``num/den`` at ``scale`` decimals
    as a DOUBLE, computed in exact DECIMAL(38,0) integer arithmetic.
    Pair every use with :func:`sql_round_frac` on the oracle side."""
    p = 10**scale
    n = num.cast("decimal(38,0)")
    a = F.abs(n) * F.lit(2 * p) + den.cast("decimal(38,0)")
    b = den.cast("decimal(38,0)") * F.lit(2)
    # (a - a mod b) / b is the exact integer quotient; Spark's decimal
    # division rounds to a fixed positive result scale, which is exact
    # here because the true quotient is integral.  The guard receives
    # the RAW num column (ADVICE r10): an input overflowing the
    # decimal(38,0) cast itself reads as NULL in `n`, which would
    # masquerade as a NULL input and flow through silently — matching
    # round_frac_int, which already passes the raw column.
    q = _check_q((a - F.pmod(a, b)) / b, num, den, "round_frac", None)
    mag = q.cast("double") / F.lit(float(p))
    return F.when(n < 0, -mag).otherwise(mag)


def round_frac_int(num: Column, den: Column, scale: int = 4) -> Column:
    """The exact integer ``q = round_half_up(10^scale * num/den)`` as a
    BIGINT (non-negative inputs only).  Useful when the scaled value
    feeds FURTHER exact arithmetic (e.g. a downstream ratio against the
    rounded estimate) instead of being emitted directly."""
    p = 10**scale
    a = num.cast("decimal(38,0)") * F.lit(2 * p) + den.cast("decimal(38,0)")
    b = den.cast("decimal(38,0)") * F.lit(2)
    return _check_q(
        (a - F.pmod(a, b)) / b, num, den, "round_frac_int", _MAX_Q_LONG
    ).cast("long")


def _bigint_num_bound(scale: int) -> int:
    """Largest numerator round_frac_bigint accepts at ``scale``: with
    ``num`` below this and ``den < 2^52``, each operand of
    ``a = 2*10^s*num + den`` is below 2^52, so ``a < 2^53`` — int64
    arithmetic cannot wrap, and the one long/long division at the end
    (a double in Spark) is exact because both operands are exactly
    representable below 2^53."""
    return (1 << 52) // (2 * 10**scale)


def round_frac_bigint(num: Column, den: Column, scale: int = 4) -> Column:
    """``round_frac_int`` on PLAIN BIGINT arithmetic — no DECIMAL(38,0)
    on the Spark side, no HUGEINT in the oracle twin
    (:func:`sql_round_frac_bigint`).  Shipped for the r11 dup-span
    column bisect (VERDICT r10 #1): the DECIMAL38/HUGEINT machinery is
    the one surface element of the three-round driver-red
    ``doc_dup_spans`` not exonerated by its green siblings, and at
    per-document magnitudes it is unnecessary — ``2*10^4*num + den``
    fits comfortably in an int64.

    Contract: ``0 <= num < 2^52/(2*10^scale)`` (~2.25e11 at scale 4)
    and ``0 < den < 2^52`` — per-document/bounded-count ratios, NOT
    corpus-scale decimal sums (those stay on :func:`round_frac_int`).
    Violations raise via the same fused ``assert_true`` idiom instead
    of wrapping silently; NULL num/den propagate to NULL."""
    p = 10**scale
    max_num = _bigint_num_bound(scale)
    n = num.cast("long")
    d = den.cast("long")
    ok = (
        n.isNull()
        | d.isNull()
        | ((n >= 0) & (n < F.lit(max_num)) & (d > 0) & (d < F.lit(1 << 52)))
    )
    guard = F.assert_true(
        ok,
        F.lit(
            f"round_frac_bigint: inputs outside the plain-BIGINT contract "
            f"(0 <= num < {max_num}, 0 < den < 2^52 at scale {scale}); "
            "use round_frac_int for corpus-scale sums"
        ),
    )
    a = n * F.lit(2 * p) + d
    b = d * F.lit(2)
    # a - pmod(a, b) is exact int64; the final division of two longs
    # (exactly divisible, both < 2^53) is one correctly-rounded —
    # here exact — IEEE op, identical to DuckDB's BIGINT `//`.
    return F.when(guard.isNull(), ((a - F.pmod(a, b)) / b).cast("long"))


def sql_round_frac_bigint(num: str, den: str, scale: int = 4) -> str:
    """DuckDB SQL twin of :func:`round_frac_bigint`: all-BIGINT, no
    HUGEINT anywhere (``//`` of two BIGINTs is BIGINT)."""
    p = 10**scale
    return (
        f"(({2 * p} * CAST(({num}) AS BIGINT) + CAST(({den}) AS BIGINT))"
        f" // (2 * CAST(({den}) AS BIGINT)))"
    )


def sql_round_frac_int(num: str, den: str, scale: int = 4) -> str:
    """DuckDB SQL twin of :func:`round_frac_int`."""
    p = 10**scale
    return (
        f"CAST((({2 * p} * CAST(({num}) AS HUGEINT) + CAST(({den}) AS HUGEINT))"
        f" // (2 * CAST(({den}) AS HUGEINT))) AS BIGINT)"
    )


def sql_round_frac(num: str, den: str, scale: int = 4) -> str:
    """DuckDB SQL twin of :func:`round_frac`: identical integer
    arithmetic in HUGEINT, identical final IEEE division.  ``num`` /
    ``den`` are SQL expressions (parenthesized by the caller if they
    contain low-precedence operators)."""
    p = 10**scale
    mag = (
        f"(CAST((({2 * p} * abs(CAST(({num}) AS HUGEINT)) + CAST(({den}) AS HUGEINT))"
        f" // (2 * CAST(({den}) AS HUGEINT))) AS DOUBLE) / {float(p)})"
    )
    return f"(CASE WHEN ({num}) < 0 THEN -{mag} ELSE {mag} END)"
