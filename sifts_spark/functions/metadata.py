"""JSON-metadata predicates and ordering.

Parity target: the reference's ``where`` dict compiler
(/root/reference/src/sifts/core.py:228-300) and multi-key ``order_by``
(core.py:302-317):

* bare value → equality (core.py:289-300)
* ``{"$eq"/"$gt"/"$lt"/"$gte"/"$lte": v}`` → comparison (core.py:263-287)
* ``{"$in"/"$nin": [..]}`` → IN list (core.py:241-261); rows whose
  metadata is NULL or lacks the key match NEITHER ``$in`` nor ``$nin``
  (SQL NULL semantics, tests/sifts/test_sqlite.py:303-316) — Spark's
  ``isin`` yields NULL for NULL input, which a filter drops, so the
  semantics line up by construction.
* numeric literal → numeric comparison (SQLite json_extract typing,
  core.py:426-427; PG ``::double precision`` cast, core.py:572) —
  we use ``try_cast('double')`` (ANSI-safe: non-numeric strings → NULL,
  never an error); string literal → lexicographic.
* unknown ``$op`` → ValueError (core.py:230-240).
* ``order_by``: ``-`` prefix = DESC with NULLS FIRST, else ASC with
  NULLS LAST (core.py:311-315) — docs with NULL metadata sort last
  ascending / first descending. Spark's ``asc_nulls_last`` /
  ``desc_nulls_first`` are exact builtins for this.

Metadata is stored as a JSON STRING column; ``get_json_object`` extracts
scalars as strings (NULL when missing) which Catalyst evaluates inside
codegen. There is no schema catalog — typing is decided per-predicate by
the Python literal's type, exactly like the reference.
"""

from __future__ import annotations

import json
import numbers
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

_OPS = {"$eq", "$gt", "$lt", "$gte", "$lte", "$in", "$nin"}


class WhereError(ValueError):
    pass


def meta_get(metadata: Column, key: str) -> Column:
    """Extract metadata[key] as a STRING (NULL if absent/NULL metadata)."""
    _validate_key(key)
    return F.get_json_object(metadata, f"$.{key}")


def _validate_key(key: str) -> None:
    # The reference .format()s keys unescaped into SQL (core.py:246-248) —
    # an injection hazard we don't inherit, but validate anyway.
    if not key or any(c in key for c in "'\"$.[]\\"):
        raise WhereError(f"invalid metadata key: {key!r}")


def _typed(
    extracted: Column, literal: Any, num: Column | None = None
) -> tuple[Column, Column]:
    """Cast the extracted string per the literal's Python type.
    ``num`` is the pre-materialized double form when the key is
    promoted (identical value to the inline try_cast)."""
    if isinstance(literal, bool):
        raise WhereError("boolean metadata comparisons are not supported")
    if isinstance(literal, numbers.Number):
        n = extracted.try_cast("double") if num is None else num
        return n, F.lit(float(literal))
    return extracted, F.lit(literal)


def compile_where(
    metadata: Column,
    where: dict[str, Any],
    promoted: dict[str, tuple[Column, Column]] | None = None,
) -> Column:
    """Fold a ``where`` dict into one conjunctive Column predicate.

    ``promoted`` maps a key to its materialized ``(string, double)``
    sidecar columns (the store's promoted-metadata layout, see
    ``DocumentStore.promote_metadata``): predicates on those keys
    compile against plain columns — parquet-pushable — instead of
    ``get_json_object`` expressions. The sidecars are written as
    exactly (raw token, raw token try_cast double), so the two forms
    are value-identical by construction."""
    pred: Column | None = None
    for key, spec in where.items():
        if promoted and key in promoted:
            extracted, num = promoted[key]
        else:
            extracted, num = meta_get(metadata, key), None
        clause = _compile_one(extracted, spec, num)
        pred = clause if pred is None else (pred & clause)
    if pred is None:
        return F.lit(True)
    return pred


def _compile_one(
    extracted: Column, spec: Any, num: Column | None = None
) -> Column:
    if not isinstance(spec, dict):
        col, lit = _typed(extracted, spec, num)
        return col == lit
    clause: Column | None = None
    for op, value in spec.items():
        if op not in _OPS:
            raise WhereError(f"Invalid operator: {op}")
        if op in ("$in", "$nin"):
            if not isinstance(value, (list, tuple)):
                raise WhereError(f"{op} requires a list")
            # element-wise typing (SQLite semantics, core.py:241-261):
            # each list element compares under ITS OWN type — a mixed
            # [0, 'alpha'] list matches value 0 numerically and 'alpha'
            # textually; a type-mismatched comparison is a NON-match
            # (SQLite type ordering), not SQL NULL — hence the
            # per-element coalesce(False). NULL/missing metadata still
            # matches neither $in nor $nin (test_sqlite.py:303-316).
            any_match: Column | None = None
            for v in value:
                col, lit = _typed(extracted, v, num)
                elem = F.coalesce(col == lit, F.lit(False))
                any_match = elem if any_match is None else (any_match | elem)
            if any_match is None:  # empty list
                any_match = F.lit(False)
            c = (
                (extracted.isNotNull() & any_match)
                if op == "$in"
                else (extracted.isNotNull() & ~any_match)
            )
        else:
            col, lit = _typed(extracted, value, num)
            c = {
                "$eq": col == lit,
                "$gt": col > lit,
                "$lt": col < lit,
                "$gte": col >= lit,
                "$lte": col <= lit,
            }[op]
        clause = c if clause is None else (clause & c)
    if clause is None:
        raise WhereError("empty operator dict")
    return clause


def compile_order_by(
    metadata: Column,
    order_by: str | list[str] | None,
    numeric: bool | str = False,
    promoted: dict[str, tuple[Column, Column]] | None = None,
) -> list[Column]:
    """order_by spec → list of sort Columns (reference core.py:302-317).

    ``promoted`` (the facade's promoted-key → ``(_m_, _mn_)`` sidecar
    map): a promoted key's sort expressions read the materialized
    columns instead of parsing the metadata JSON per row — the sort
    order is identical by the write-path construction (the sidecars
    ARE the extracted token and its try_cast double), the per-row
    get_json_object evaluation just disappears from the sort stage.

    ``numeric``:

    * ``False`` — lexicographic on the extracted string.
    * ``True`` — cast to double before sorting.
    * ``"auto"`` (the facade default) — emulate SQLite ``json_extract``
      typed ordering (core.py:426-430): per value, numbers sort
      numerically and BEFORE strings (SQLite type order NULL < number <
      text), strings lexicographically — so ``order_by="k"`` over
      numeric metadata gives 9 < 10, not "10" < "9". Caveat: JSON
      *strings* that look numeric ("10") are indistinguishable from
      numbers after ``get_json_object`` extraction and sort numerically.

    Null placement (core.py:311-315): DESC → NULLS FIRST, ASC → NULLS
    LAST — docs with NULL metadata always sort last ascending / first
    descending.
    """
    if order_by is None:
        return []
    keys = [order_by] if isinstance(order_by, str) else list(order_by)
    cols: list[Column] = []
    for raw in keys:
        desc = raw.startswith("-")
        key = raw.lstrip("+-")
        if promoted and key in promoted:
            col, pnum = promoted[key]
        else:
            col, pnum = meta_get(metadata, key), None
        if numeric == "auto":
            num = col.try_cast("double") if pnum is None else pnum
            # (missing, typeclass, numeric value, string value) — each
            # piece directed together so the whole key reverses cleanly.
            pieces = [col.isNull(), num.isNull(), num, col]
            cols.extend(p.desc() if desc else p.asc() for p in pieces)
            continue
        if numeric is True:
            col = col.try_cast("double") if pnum is None else pnum
        cols.append(col.desc_nulls_first() if desc else col.asc_nulls_last())
    return cols


def _order_pieces(
    col: Column, numeric: bool | str, num: Column | None = None
) -> list[Column]:
    """One order key → the piece tuple whose plain lexicographic order
    (every piece in the KEY's direction) equals :func:`compile_order_by`'s
    sort for that key.

    The leading ``isNull()`` piece encodes the null placement explicitly
    (ASC: ``false < true`` puts nulls last; DESC reversed puts them
    first), so the keyset predicate below never needs nulls-first/last
    variants — a null never wins a ``>``/``<`` against anything (SQL
    null comparison → NULL, coalesced to false), and null-vs-null falls
    through the null-safe equality chain to the next piece. Semantics
    are cross-pinned against offset pagination by the cursor-walk
    equivalence tests, not by sharing code with ``compile_order_by``
    (whose single-column ``asc_nulls_last`` plans are byte-pinned
    elsewhere).

    ``num`` is the pre-materialized double form when the key is
    promoted (a ``_mn_<key>`` sidecar column — value-identical to the
    inline try_cast by the store's write-path construction), so a
    promoted cursor predicate stays a plain-column comparison that
    reaches PushedFilters."""
    if numeric == "auto":
        n = col.try_cast("double") if num is None else num
        return [col.isNull(), n.isNull(), n, col]
    if numeric is True:
        n = col.try_cast("double") if num is None else num
        return [n.isNull(), n]
    return [col.isNull(), col]


def lexicographic_after(pairs: list[tuple[Column, Column, bool]]) -> Column:
    """Strictly-after predicate over an ordered key tuple.

    ``pairs``: ``(row_expr, cursor_expr, desc)`` per piece, most
    significant first. Returns ``OR_i (AND_{j<i} eq_j) AND gt_i`` —
    the standard keyset (seek-method) row comparison, null-safe:
    equality is ``eqNullSafe`` and a NULL comparison coalesces to
    false, so rows never leak past a null cursor piece."""
    if not pairs:
        raise WhereError("keyset cursor needs at least one order piece")
    pred: Column | None = None
    eq_chain: Column | None = None
    for row, cur, desc in pairs:
        gt = F.coalesce((row < cur) if desc else (row > cur), F.lit(False))
        term = gt if eq_chain is None else (eq_chain & gt)
        pred = term if pred is None else (pred | term)
        eq = row.eqNullSafe(cur)
        eq_chain = eq if eq_chain is None else (eq_chain & eq)
    return pred


def _promoted_seek_guard(
    pcol: Column, pnum: Column, desc: bool, cursor_metadata_json: str | None,
    key: str,
) -> Column | None:
    """Value-REDUNDANT range guard on the LEADING promoted order key.

    The exact strictly-after predicate (:func:`lexicographic_after`)
    is a coalesce/eqNullSafe tree the parquet source cannot translate,
    so on its own a promoted-key cursor page still scans every row
    group. But lexicographic order implies every after-row is >= the
    cursor on the FIRST key (in its direction), and under the "auto"
    typed order (NULL < number < text, the piece tuple
    ``[isNull, numIsNull, num, col]``) that containment compiles to a
    disjunction/conjunction of plain IsNull/IsNotNull/range atoms over
    the ``_m_``/``_mn_`` sidecars — all parquet-pushable, so row
    groups wholly before the cursor skip on min/max stats (the seek
    method's I/O win, not just its heap win).

    The guard must be a SUPERSET of the after-set under the row-side
    classing, which the driver cannot always reproduce exactly:
    ``try_cast('double')`` puts numeric-LOOKING strings ("10") in the
    number class, so a cursor string that Python can parse as a float
    is AMBIGUOUS (Python ``float`` accepts a superset of Spark's cast
    grammar, e.g. "1_0") — those get the guard that is a superset
    under EITHER classing. Non-string non-numeric values (bools,
    nested JSON) keep only the class-level guard — their serialized
    spelling is not byte-pinned between Python and Spark. Returns None
    when every row trivially satisfies the containment (e.g. desc from
    a NULL cursor). ANDed with the exact predicate, never replacing it
    — correctness never depends on this function."""
    v = None
    if cursor_metadata_json:
        try:
            d = json.loads(cursor_metadata_json)
        except ValueError:
            d = None
        if isinstance(d, dict):
            v = d.get(key)
    if v is None:
        # cursor in the NULL class: asc (nulls last) → only NULL rows
        # remain; desc (nulls first) → everything may follow.
        return pcol.isNull() if not desc else None
    num: float | None = None
    token: str | None = None
    if isinstance(v, bool):
        pass  # "true"/"false" tokens: class-level guard only
    elif isinstance(v, numbers.Number):
        num = float(v)  # a JSON number token always casts: exact class
    elif isinstance(v, str):
        token = v
        try:
            num = float(v)  # ambiguous: number class under try_cast
        except ValueError:
            num = None  # plain string class under both grammars
    if num is not None and token is None:
        # unambiguous number class
        if desc:
            return pnum.isNotNull() & (pnum <= F.lit(num))
        return pcol.isNull() | pnum.isNull() | (pnum >= F.lit(num))
    if token is not None and num is None:
        # unambiguous string class
        if desc:
            # after a string: lesser/equal strings, then every number
            return pcol.isNotNull() & (
                pnum.isNotNull() | (pcol <= F.lit(token))
            )
        return pcol.isNull() | (pnum.isNull() & (pcol >= F.lit(token)))
    if token is not None:
        # ambiguous (numeric-looking string): superset under either
        # classing — asc keeps the whole string+null classes, desc
        # keeps the whole number class.
        if desc:
            return pcol.isNotNull() & (
                pnum.isNotNull() | (pcol <= F.lit(token))
            )
        return pcol.isNull() | pnum.isNull() | (pnum >= F.lit(num))
    # bool / nested JSON: class-level only (strings + nulls asc)
    if desc:
        return pcol.isNotNull()
    return pcol.isNull() | pnum.isNull()


def compile_keyset_after(
    metadata: Column,
    order_by: str | list[str] | None,
    cursor_metadata_json: str | None,
    cursor_id: str,
    id_col: Column,
    numeric: bool | str = False,
    promoted: dict[str, tuple[Column, Column]] | None = None,
) -> Column:
    """Keyset-pagination predicate: rows strictly AFTER the cursor row
    in ``compile_order_by(order_by)``'s total order (id ascending as
    the final tiebreak, matching the paginator's deterministic sort).

    The cursor side re-runs the SAME extraction/cast expressions over
    ``lit(cursor_metadata_json)`` — Catalyst constant-folds them — so
    both sides of every comparison share one semantics by construction
    (typed-ordering pieces included). At scale this replaces
    sort-then-``OFFSET N`` (every partition's top-N+page heap grows
    with the offset) with filter-then-top-``page`` — the seek method:
    the per-partition heap stays page-sized no matter how deep the
    walk is.

    ``promoted`` (the facade's promoted-key → ``(_m_, _mn_)`` sidecar
    map): the ROW side of a promoted key's pieces reads the
    materialized columns instead of ``get_json_object``, so the seek
    filter pushes to the parquet scan on exactly the collections that
    opted into pushdown. The CURSOR side still extracts from the
    literal JSON (constant-folded) — both sides compare identical
    values by the write-path construction.
    """
    lit_meta = F.lit(cursor_metadata_json).cast("string")
    keys = (
        [order_by] if isinstance(order_by, str) else list(order_by or [])
    )
    pairs: list[tuple[Column, Column, bool]] = []
    guard: Column | None = None
    for i, raw in enumerate(keys):
        desc = raw.startswith("-")
        key = raw.lstrip("+-")
        if promoted and key in promoted:
            pcol, pnum = promoted[key]
            row_pieces = _order_pieces(pcol, numeric, num=pnum)
            if i == 0 and numeric == "auto":
                # leading-key containment: every after-row is >= the
                # cursor on the first key, and over sidecar columns
                # that compiles to parquet-pushable atoms (the exact
                # predicate below is a coalesce tree the source cannot
                # translate). Redundant by construction.
                guard = _promoted_seek_guard(
                    pcol, pnum, desc, cursor_metadata_json, key
                )
        else:
            row_pieces = _order_pieces(meta_get(metadata, key), numeric)
        cur_pieces = _order_pieces(meta_get(lit_meta, key), numeric)
        pairs.extend(
            (r, c, desc) for r, c in zip(row_pieces, cur_pieces)
        )
    pairs.append((id_col, F.lit(cursor_id), False))
    pred = lexicographic_after(pairs)
    return pred if guard is None else (guard & pred)
