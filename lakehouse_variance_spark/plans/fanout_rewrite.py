"""Partial-COUNT pushdown through multiplicative LEFT-join fan-outs,
as a SQL -> SQL rewrite over the reference's generated workload texts.

The reference's Trino survives the "two fact tables LEFT-joined through a
tiny shared dimension key" texts (e.g. Local_TPCDS train q29/q2172) via
``optimizer.push-partial-aggregation-through-join``; Catalyst has no such
rule, so the verbatim text materializes the multiplicative fan-out
(~1e9-1e11 intermediate rows at sf0.1) and blows the reference's 300 s
kill budget.  This module IS that missing rewrite, applied at the SQL
layer so the ENGINE runs the factored form while the DuckDB oracle keeps
the naive text — every sweep hash-match is a proof of the rewrite.

Factorization (the math behind ``fanout_count_pushdown``,
operators/relational_ds3.py): for a COUNT(*)-only aggregate over a hub
table LEFT-joined to branch subtrees B1..Bn where every WHERE conjunct
references exactly one table, the join result per hub row h is the
cartesian product of the per-branch row sets, so

    COUNT(*) grouped by G  =  SUM over h of  hub_cnt(h) * prod_i f_i(h)

with, per branch i:
  * no conjuncts on the branch      -> f_i = max(match_cnt, 1)
    (a LEFT join with zero matches contributes exactly one NULL row);
  * >=1 NULL-REJECTING conjunct     -> f_i = match_cnt_after_preds, and
    hub rows with f_i = 0 drop entirely (the NULL row cannot pass a
    null-rejecting predicate, so the join is effectively INNER);
  * conjuncts but none null-rejecting -> NOT rewritten (the NULL row may
    survive while real rows are filtered; exactness would need pre- and
    post-filter counts).  ``rewrite_fanout_count`` returns None and the
    text runs verbatim.

GROUP BY columns may live on the hub and/or exactly ONE branch (the
group branch's count table carries its group columns; a LEFT-mode group
branch contributes the all-NULL group with weight 1, matching the naive
NULL row).

Scale: the 1e11-row fan-out becomes one keyed partial count per branch
(map-side combined, reduced at |branch keys| cardinality) plus arithmetic
on a |hub|-row join — the exact plan Trino's pushdown produces.  Counts
multiply as BIGINT (exact to 2^63; per-key counts beyond ~2e6 would need
DECIMAL(38,0)).

The rewrite FIRES only when >=2 branches hang off the hub by a
non-unique child-side join column (the multiplicative shape); unique
dimension keys are declared per schema in ``UNIQUE_KEYS`` — firing is a
performance heuristic, never a correctness condition (the factored form
is exact whenever this module emits it).
"""

from __future__ import annotations

import re

# Per-schema dimension primary keys: a root->child join on one of these
# child columns has multiplicity <= 1 and cannot fan out.  Tables absent
# from the map (the fact tables) are treated as many-rows-per-key.
UNIQUE_KEYS: dict[str, dict[str, set[str]]] = {
    "tpcds": {
        "date_dim": {"d_date_sk"},
        "time_dim": {"t_time_sk"},
        "item": {"i_item_sk"},
        "customer": {"c_customer_sk"},
        "customer_address": {"ca_address_sk"},
        "customer_demographics": {"cd_demo_sk"},
        "household_demographics": {"hd_demo_sk"},
        "income_band": {"ib_income_band_sk"},
        "store": {"s_store_sk"},
        "call_center": {"cc_call_center_sk"},
        "web_site": {"web_site_sk"},
        "web_page": {"wp_web_page_sk"},
        "warehouse": {"w_warehouse_sk"},
        "promotion": {"p_promo_sk"},
        "reason": {"r_reason_sk"},
        "ship_mode": {"sm_ship_mode_sk"},
        "catalog_page": {"cp_catalog_page_sk"},
    },
    # Every IMDB table's surrogate `id` is unique; joins land on the
    # movie_id/person_id/... foreign keys when they fan out.
    "job": {
        t: {"id"}
        for t in (
            "kind_type", "company_type", "comp_cast_type", "role_type",
            "link_type", "info_type", "title", "name", "aka_name",
            "aka_title", "cast_info", "movie_companies", "movie_info",
            "movie_info_idx", "movie_keyword", "person_info",
            "company_name", "char_name", "keyword", "movie_link",
            "complete_cast",
        )
    },
    "ssb": {
        "dim_date": {"d_datekey"},
        "customer": {"c_custkey"},
        "supplier": {"s_suppkey"},
        "part": {"p_partkey"},
    },
}

_IDENT = r'"(\w+)"\s*\.\s*"(\w+)"'
_JOIN_RE = re.compile(
    rf'\bLEFT\s+OUTER\s+JOIN\s+"(\w+)"\s+ON\s+{_IDENT}\s*=\s*{_IDENT}',
    re.IGNORECASE,
)
_REF_RE = re.compile(_IDENT)


def _scan_split(text: str, sep_words: tuple[str, ...]) -> list[str]:
    """Split ``text`` on any of ``sep_words`` (single uppercase-insensitive
    words, e.g. ("AND",)) at paren depth 0 and outside quoted regions."""
    parts: list[str] = []
    depth = 0
    i = 0
    start = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            i += 1
            while i < n:
                if text[i] == "'":
                    if i + 1 < n and text[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif ch == '"':
            i += 1
            while i < n and text[i] != '"':
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and (ch.isalpha() or ch == "_"):
            j = i
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            word = text[i:j].upper()
            if word in sep_words and (i == 0 or not (
                text[i - 1].isalnum() or text[i - 1] == "_"
            )):
                parts.append(text[start:i])
                start = j
                i = j
                continue
            i = j
            continue
        i += 1
    parts.append(text[start:])
    return [p.strip() for p in parts if p.strip()]


def _find_clause(text: str, keyword: str) -> int:
    """Index of top-level ``keyword`` (possibly two words) in ``text``,
    outside quotes/parens; -1 if absent."""
    words = keyword.upper().split()
    depth = 0
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            i += 1
            while i < n:
                if text[i] == "'":
                    if i + 1 < n and text[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif ch == '"':
            i += 1
            while i < n and text[i] != '"':
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and (ch.isalpha() or ch == "_"):
            j = i
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            if text[i:j].upper() == words[0] and (
                i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_")
            ):
                if len(words) == 1:
                    return i
                rest = text[j:].lstrip()
                if rest.upper().startswith(words[1]) and not (
                    len(rest) > len(words[1])
                    and (rest[len(words[1])].isalnum()
                         or rest[len(words[1])] == "_")
                ):
                    return i
            i = j
            continue
        i += 1
    return -1


# A conjunct is NULL-REJECTING when all-NULL column inputs cannot make it
# TRUE.  Comparisons, IN, (NOT) LIKE, BETWEEN, != and OR/AND combinations
# of those all yield NULL on NULL inputs (never TRUE); `x IS NOT NULL` is
# FALSE on NULL.  The only generator-expressible escapes are `IS NULL`
# and NULL-defaulting functions — their presence disqualifies.
_NULL_SAFE_STRIP = re.compile(r"\bIS\s+NOT\s+NULL\b", re.IGNORECASE)
_NULL_ESCAPES = re.compile(
    r"\bIS\s+NULL\b|\bCOALESCE\b|\bIFNULL\b|\bNULLIF\b|\bCASE\b"
    r"|\bDISTINCT\s+FROM\b|\bTRUE\b",
    re.IGNORECASE,
)


def _null_rejecting(conjunct: str) -> bool:
    return not _NULL_ESCAPES.search(_NULL_SAFE_STRIP.sub("", conjunct))


_COUNT_ITEM = re.compile(
    r"^(?:CAST\s*\(\s*)?COUNT\s*\(\s*\*\s*\)(?:\s*AS\s+BIGINT\s*\))?"
    r"\s+AS\s+(\w+)$",
    re.IGNORECASE,
)
_COL_ITEM = re.compile(rf"^{_IDENT}$")
_ORDER_ITEM = re.compile(
    rf"^{_IDENT}(\s+(?:ASC|DESC))?(\s+NULLS\s+(?:FIRST|LAST))?$",
    re.IGNORECASE,
)


def rewrite_fanout_count(sql: str, schema: str) -> str | None:
    """Rewrite a generated COUNT(*) fan-out text to its count-product
    form, or return None when the text is not (provably) in scope.

    The returned SQL uses the same double-quoted-identifier dialect as
    the input (runnable on DuckDB natively and on Spark via
    ``synth_common.sql_quoted_idents``) and produces the exact rows the
    naive text produces — the output column names match the naive
    query's, so order-insensitive value hashes carry over.
    """
    unique = UNIQUE_KEYS.get(schema)
    if unique is None:
        return None
    text = sql.strip().rstrip(";").strip()
    up = text.upper()
    if not up.startswith("SELECT"):
        return None
    # Out-of-scope constructs anywhere in the text.
    for bad in ("WITH", " UNION ", " INTERSECT ", " EXCEPT ", " HAVING ",
                " LIMIT ", "DISTINCT", " RIGHT ", " FULL ", " CROSS ",
                " INNER "):
        if _find_clause(text, bad.strip()) >= 0:
            return None

    i_from = _find_clause(text, "FROM")
    if i_from < 0:
        return None
    select_list = text[len("SELECT"):i_from].strip()
    rest = text[i_from + len("FROM"):].strip()

    i_where = _find_clause(rest, "WHERE")
    i_group = _find_clause(rest, "GROUP")
    i_order = _find_clause(rest, "ORDER")
    ends = sorted(x for x in (i_where, i_group, i_order) if x >= 0)
    i_end = ends[0] if ends else len(rest)
    from_clause = rest[:i_end].strip()
    where_clause = (
        rest[i_where + len("WHERE"):(i_group if i_group >= 0 else
                                     i_order if i_order >= 0 else
                                     len(rest))].strip()
        if i_where >= 0 else ""
    )
    group_clause = (
        rest[i_group:(i_order if i_order >= 0 else len(rest))]
        if i_group >= 0 else ""
    )
    group_clause = re.sub(
        r"(?is)^GROUP\s+BY", "", group_clause
    ).strip() if group_clause else ""
    order_clause = rest[i_order:] if i_order >= 0 else ""
    order_clause = re.sub(
        r"(?is)^ORDER\s+BY", "", order_clause
    ).strip() if order_clause else ""

    m_root = re.match(r'^"(\w+)"\s*', from_clause)
    if not m_root:
        return None
    root = m_root.group(1)
    joins_text = from_clause[m_root.end():].strip()

    # ---- join tree -------------------------------------------------
    parent: dict[str, str] = {}
    join_key: dict[str, tuple[str, str]] = {}  # child -> (parent_col, child_col)
    tables = {root}
    join_order: list[str] = []  # original join sequence: parent-before-child
    pos = 0
    while pos < len(joins_text):
        m = _JOIN_RE.match(joins_text, pos)
        if not m:
            return None
        child, t1, c1, t2, c2 = m.groups()
        if child in tables:
            return None  # repeated table / alias — out of scope
        if t1 in tables and t2 == child:
            par, pc, cc = t1, c1, c2
        elif t2 in tables and t1 == child:
            par, pc, cc = t2, c2, c1
        else:
            return None
        parent[child] = par
        join_key[child] = (pc, cc)
        tables.add(child)
        join_order.append(child)
        pos = m.end()
        while pos < len(joins_text) and joins_text[pos].isspace():
            pos += 1

    if not parent:
        return None

    def branch_of(t: str) -> str | None:
        """Root's child anchoring ``t``'s subtree (None for the root)."""
        while parent.get(t) is not None and parent[t] != root:
            t = parent[t]
        return t if t != root else None

    branch_roots = sorted({branch_of(t) for t in join_order})
    # Original join sequence guarantees parent-before-child within each
    # branch's chain (required for the emitted LEFT JOIN chain to bind).
    branch_tables: dict[str, list[str]] = {b: [] for b in branch_roots}
    for t in join_order:
        branch_tables[branch_of(t)].append(t)

    # ---- select list ------------------------------------------------
    count_alias: str | None = None
    sel_cols: list[tuple[str, str]] = []
    for item in _split_commas(select_list):
        m = _COUNT_ITEM.match(item)
        if m:
            if count_alias is not None:
                return None
            count_alias = m.group(1)
            continue
        m = _COL_ITEM.match(item)
        if not m or m.group(1) not in tables:
            return None
        sel_cols.append((m.group(1), m.group(2)))
    if count_alias is None:
        return None
    bare = [c for _, c in sel_cols]
    if len(set(bare)) != len(bare) or count_alias in bare:
        return None  # ambiguous output names — out of scope

    # GROUP BY must list exactly the plain select columns.
    group_cols: list[tuple[str, str]] = []
    if group_clause:
        for item in _split_commas(group_clause):
            m = _COL_ITEM.match(item.strip())
            if not m:
                return None
            group_cols.append((m.group(1), m.group(2)))
    if sorted(group_cols) != sorted(sel_cols):
        return None

    # Group columns confined to the root plus at most ONE branch.
    group_branches = {branch_of(t) for t, _ in group_cols} - {None}
    if len(group_branches) > 1:
        return None
    group_branch = next(iter(group_branches), None)

    # ---- conjunct assignment ----------------------------------------
    root_conj: list[str] = []
    branch_conj: dict[str, list[str]] = {b: [] for b in branch_roots}
    if where_clause:
        for conj in _scan_split(where_clause, ("AND",)):
            refs = {t for t, _ in _REF_RE.findall(conj)}
            if len(refs) != 1 or not refs <= tables:
                return None
            (t,) = refs
            if t == root:
                root_conj.append(conj)
            else:
                branch_conj[branch_of(t)].append(conj)

    # ---- branch modes ------------------------------------------------
    mode: dict[str, str] = {}
    for b in branch_roots:
        conjs = branch_conj[b]
        if not conjs:
            mode[b] = "left"
        elif any(_null_rejecting(c) for c in conjs):
            mode[b] = "inner"
        else:
            return None

    # ---- firing heuristic: >=2 multiplicative branches ---------------
    many = [
        b for b in branch_roots
        if join_key[b][1] not in unique.get(b, ())
    ]
    if len(many) < 2:
        return None

    # ---- emit --------------------------------------------------------
    hub_keys = sorted({join_key[b][0] for b in branch_roots})
    root_group = [(t, c) for t, c in group_cols if t == root]
    hub_sel = [f'"{root}"."{c}" AS "hk_{c}"' for c in hub_keys]
    hub_sel += [f'"{root}"."{c}" AS "{c}"' for _, c in root_group]
    hub_where = f" WHERE {' AND '.join(root_conj)}" if root_conj else ""
    hub_grp = ", ".join(
        [f'"{root}"."{c}"' for c in hub_keys]
        + [f'"{root}"."{c}"' for _, c in root_group]
    )
    ctes = [
        f'hub AS (SELECT {", ".join(hub_sel)}, COUNT(*) AS "hf" '
        f'FROM "{root}"{hub_where} GROUP BY {hub_grp})'
    ]
    for idx, b in enumerate(branch_roots):
        pc, cc = join_key[b]
        chain = f'"{b}"'
        for t in branch_tables[b]:
            if t == b:
                continue
            p = parent[t]
            tpc, tcc = join_key[t]
            chain += (
                f' LEFT OUTER JOIN "{t}" ON "{p}"."{tpc}" = "{t}"."{tcc}"'
            )
        bw = (
            f" WHERE {' AND '.join(branch_conj[b])}"
            if branch_conj[b] else ""
        )
        gcols = [(t, c) for t, c in group_cols if branch_of(t) == b]
        gsel = "".join(f', "{t}"."{c}" AS "{c}"' for t, c in gcols)
        ggrp = "".join(f', "{t}"."{c}"' for t, c in gcols)
        ctes.append(
            f'br_{idx} AS (SELECT "{b}"."{cc}" AS "k"{gsel}, '
            f'COUNT(*) AS "f" FROM {chain}{bw} '
            f'GROUP BY "{b}"."{cc}"{ggrp})'
        )

    joins = []
    factors = ['"hf"']
    for idx, b in enumerate(branch_roots):
        pc, _ = join_key[b]
        jk = "JOIN" if mode[b] == "inner" else "LEFT OUTER JOIN"
        joins.append(f'{jk} br_{idx} ON hub."hk_{pc}" = br_{idx}."k"')
        factors.append(
            f'br_{idx}."f"' if mode[b] == "inner"
            else f'COALESCE(br_{idx}."f", 1)'
        )

    out_cols = []
    for t, c in sel_cols:
        if t == root:
            out_cols.append(f'hub."{c}"')
        else:
            idx = branch_roots.index(branch_of(t))
            out_cols.append(f'br_{idx}."{c}"')
    product = " * ".join(factors)
    agg = f'CAST(SUM({product}) AS BIGINT)'
    if not group_cols:
        # naive COUNT(*) with no GROUP BY returns one row even on empty
        agg = f'CAST(COALESCE(SUM({product}), 0) AS BIGINT)'
    sel_out = ", ".join(
        [f'{src} AS "{c}"' for src, (_, c) in zip(out_cols, sel_cols)]
        + [f'{agg} AS "{count_alias}"']
    )
    final = (
        f'WITH {", ".join(ctes)} SELECT {sel_out} '
        f'FROM hub {" ".join(joins)}'
    )
    if group_cols:
        final += " GROUP BY " + ", ".join(out_cols)
    if order_clause:
        items = []
        for item in _split_commas(order_clause):
            m = _ORDER_ITEM.match(item.strip())
            if not m:
                return None
            t, c = m.group(1), m.group(2)
            if (t, c) not in sel_cols:
                return None
            items.append(f'"{c}"{m.group(3) or ""}{m.group(4) or ""}')
        final += " ORDER BY " + ", ".join(items)
    return final


def _split_commas(text: str) -> list[str]:
    """Top-level comma split (quote/paren aware)."""
    parts: list[str] = []
    depth = 0
    start = 0
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            i += 1
            while i < n:
                if text[i] == "'":
                    if i + 1 < n and text[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif ch == '"':
            i += 1
            while i < n and text[i] != '"':
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
        i += 1
    parts.append(text[start:])
    return [p for p in (s.strip() for s in parts) if p]
