"""Naive single-threaded DQL interpreter — an independent oracle for the
21million corpus (and any graph small enough to hold in dicts).

Why this exists: the reference's pinned 21million answers assume the
full 21M-triple dataset; only the 200k-triple subset is vendored, so 30
of the 69 corpus queries can't be checked against their pinned JSON.
This module recomputes each query's SUBSET answer with plain Python
dict walks — no Spark, no Catalyst, no DataFrames — so the engine's
answer can be value-verified query-by-query (tests/test_pyeval_oracle).

Shares ONLY the DQL parser with the engine (dgraph_spark/dql/parser,
itself pinned by the 251-case parser-parity corpus); every evaluation
rule below is written from the reference's query package semantics
(query/query.go, worker/sort.go, worker/task.go) independently of the
Spark executor.
"""

from __future__ import annotations

import re
import unicodedata
from datetime import datetime

from dgraph_spark.dql.parser import parse_dql


# ---------------------------------------------------------------- data model
class NaiveGraph:
    """In-memory triple store: scalars[pred][uid] = [(lang, value)],
    edges[pred][uid] = [dst...] (uid-sorted), redges the reverse."""

    def __init__(self, schema):
        self.schema = schema
        self.scalars: dict[str, dict[int, list]] = {}
        self.edges: dict[str, dict[int, list[int]]] = {}
        self.redges: dict[str, dict[int, list[int]]] = {}
        # (pred, subj, obj) -> {facet key: typed value} for uid edges
        self.efacets: dict[tuple, dict] = {}

    @classmethod
    def load_warehouse(cls, warehouse: str, schema) -> "NaiveGraph":
        import duckdb

        g = cls(schema)
        con = duckdb.connect()
        rows = con.execute(
            f"""SELECT predicate, subject, object_uid, value_str, lang,
                       facets
                FROM read_parquet('{warehouse}/*/*.parquet',
                                  hive_partitioning=1)"""
        ).fetchall()
        for pred, subj, obj, val, lang, facets in rows:
            if obj is not None and (not schema.has(pred) or schema.get(pred).is_uid):
                g.edges.setdefault(pred, {}).setdefault(subj, []).append(obj)
                g.redges.setdefault(pred, {}).setdefault(obj, []).append(subj)
                if facets:
                    # duckdb renders MAP as {'key': [...], 'value': [...]}
                    items = (zip(facets["key"], facets["value"])
                             if set(facets) == {"key", "value"}
                             else facets.items())
                    g.efacets[(pred, subj, obj)] = {
                        k: _type_facet(v) for k, v in items}
            else:
                typ = schema.get(pred).typ if schema.has(pred) else "string"
                g.scalars.setdefault(pred, {}).setdefault(subj, []).append(
                    (lang, _type_value(val, typ)))
        for m in list(g.edges.values()) + list(g.redges.values()):
            for k in m:
                m[k].sort()
        return g

    # ------------------------------------------------------------- accessors
    def value(self, uid: int, pred: str, langs: list[str]):
        """First value honouring the @lang fallback chain; None if absent.
        No tag => untagged posting only (query/query.go fieldName rules)."""
        postings = self.scalars.get(pred, {}).get(uid)
        if not postings:
            return None
        if not langs:
            for lang, v in postings:
                if lang is None:
                    return v
            return None
        for want in langs:
            if want == ".":
                # any language, preferring untagged; deterministic
                # alphabetical-lang tiebreak (the engine's documented
                # rule — insertion order diverged when a node had only
                # tagged values, caught by the lang-chain SQL fuzz leg)
                for lang, v in postings:
                    if lang is None:
                        return v
                return min(postings, key=lambda p: p[0])[1]
            for lang, v in postings:
                if lang == want:
                    return v
        return None

    def out(self, uid: int, pred: str) -> list[int]:
        return self.edges.get(pred, {}).get(uid, [])

    def inc(self, uid: int, pred: str) -> list[int]:
        return self.redges.get(pred, {}).get(uid, [])

    def neighbours(self, uid: int, pred: str) -> list[int]:
        if pred.startswith("~"):
            return self.inc(uid, pred[1:])
        return self.out(uid, pred)

    def count(self, uid: int, pred: str) -> int:
        if pred.startswith("~"):
            return len(self.inc(uid, pred[1:]))
        if pred in self.edges:
            return len(self.out(uid, pred))
        # scalar posting-list length: untagged postings only
        return sum(1 for lang, _ in self.scalars.get(pred, {}).get(uid, [])
                   if lang is None)

    def has(self, uid: int, pred: str) -> bool:
        if pred.startswith("~"):
            return bool(self.inc(uid, pred[1:]))
        return bool(self.out(uid, pred)) or uid in self.scalars.get(pred, {})

    def subjects(self, pred: str):
        if pred.startswith("~"):
            return self.redges.get(pred[1:], {}).keys()
        out = set(self.edges.get(pred, {}).keys())
        out.update(self.scalars.get(pred, {}).keys())
        return out


def _type_value(val: str, typ: str):
    if val is None:
        return None
    if typ == "datetime":
        return _parse_dt(val)
    if typ in ("int",):
        return int(val)
    if typ in ("float",):
        return float(val)
    if typ == "bool":
        return val == "true"
    return val


def _type_facet(v: str):
    """Facet value typing (types/facets/utils.go valAndValType): a
    QUOTED value stays a string; otherwise int, then float, then bool,
    then RFC3339 datetime, else string."""
    if v is None:
        return None
    if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
        return v[1:-1]
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    if v in ("true", "false"):
        return v == "true"
    if re.match(r"^\d{4}-\d{2}-\d{2}(T|$)", v):
        try:
            return _parse_dt(v)
        except ValueError:
            pass
    return v


def _parse_dt(s: str) -> datetime:
    s = s.strip().replace(" ", "T")
    s = re.sub(r"Z$", "+00:00", s)
    if re.fullmatch(r"\d{4}", s):
        s += "-01-01"
    elif re.fullmatch(r"\d{4}-\d{2}", s):
        s += "-01"
    if "T" not in s:
        s += "T00:00:00"
    dt = datetime.fromisoformat(s)
    return dt.replace(tzinfo=None)


def _render(v):
    """JSON rendering, matching the reference's marshalling (datetimes as
    RFC3339 with trailing-zero-trimmed fractions)."""
    if isinstance(v, datetime):
        # %Y drops leading zeros for years < 1000 on glibc — pad manually
        out = f"{v.year:04d}-" + v.strftime("%m-%dT%H:%M:%S")
        if v.microsecond:
            out += ("%.6f" % (v.microsecond / 1e6))[1:].rstrip("0")
        return out + "Z"
    return v


def _collate_en(v: str) -> tuple:
    """Approximation of the lang-tagged sort collation (worker/sort.go
    sorts lang-tagged strings with x/text collate): primary = base
    letters (accents stripped, case-folded) with ICU-style category
    weights — whitespace/controls < punctuation < symbols < digits <
    letters (so '¿Puede…' sorts before 'A…' and TAB before SPACE, both
    matching the engine and the reference's pinned q19 order); ties
    break on the raw string."""
    import unicodedata

    ranks = {"Z": 0, "C": 0, "P": 1, "S": 2, "N": 3, "L": 4}
    primary = tuple(
        (ranks.get(unicodedata.category(c)[0], 2), c)
        for c in unicodedata.normalize("NFKD", v).casefold()
        if not unicodedata.combining(c))
    return (primary, v)


def _is_term_char(c: str) -> bool:
    # letters, digits, and combining marks (matching the engine's
    # [^\p{L}\p{M}\p{N}]+ split — bleve's unicode tokenizer keeps
    # combining marks attached); underscore splits, unlike \w
    return c.isalnum() or unicodedata.category(c).startswith("M")


def _terms(s: str) -> list[str]:
    out, cur = [], []
    for c in s.lower():
        if _is_term_char(c):
            cur.append(c)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


# ---------------------------------------------------------------- evaluator
class PyEval:
    def __init__(self, g: NaiveGraph):
        self.g = g
        self.uid_vars: dict[str, set[int]] = {}
        # var -> (values dict uid->val, chain: list of parent-edge lists
        # from the defining block's root DOWN to the definition level;
        # each entry is list[(parent, child)])
        self.val_vars: dict[str, tuple[dict, list]] = {}

    # ------------------------------------------------------------ entry
    def execute(self, dql: str) -> dict:
        parsed = parse_dql(dql)
        out: dict = {}
        blocks = list(parsed.blocks)
        done = [False] * len(blocks)
        for _round in range(len(blocks) + 1):
            progressed = False
            for i, b in enumerate(blocks):
                if done[i]:
                    continue
                if not self._deps_ready(b):
                    continue
                rows = self._eval_block(b)
                if not b.is_var_block and rows is not None:
                    out[b.alias] = rows
                done[i] = True
                progressed = True
            if all(done):
                break
            if not progressed:
                raise ValueError("unresolvable variable dependencies")
        return out

    def _deps_ready(self, b) -> bool:
        for v in _read_vars(b):
            if v not in self.uid_vars and v not in self.val_vars:
                return False
        return True

    # ------------------------------------------------------------ roots
    def _eval_block(self, b) -> list:
        if b.func is None:
            # bare aggregation block: me() { min(val(d)) }
            return self._agg_only_block(b)
        uids = self._root_uids(b.func)
        if b.filter is not None:
            uids = [u for u in uids if self._filter_ok(b.filter, u)]
        if b.var:
            self.uid_vars[b.var] = set(uids)
        uids = self._sort_page(uids, b, defer_page=_has_cascade(b))
        if b.groupby is not None:
            return self._groupby_block(b, uids)
        if b.recurse is not None:
            return self._recurse_block(b, uids)
        count_uid = [a for a in b.children if not _is_block(a)
                     and getattr(a, "is_count", False) and a.name == "uid"]
        if count_uid:
            # count(uid) block: ONE row, even over an empty root
            # (query/outputnode.go "count" key)
            return [{a.alias or "count": len(uids) for a in count_uid}]
        if b.ignorereflex:
            rows = [(u, self._descend_reflex(b, u, {u})) for u in uids]
            rows = [(u, o) for u, o in rows if o]
        else:
            rows, _ = self._descend(b, [(None, u) for u in uids], [],
                                    cascading=b.cascade is not None)
            pos = {u: i for i, u in enumerate(uids)}
            rows.sort(key=lambda r: pos[r[0]])  # root order survives descent
        if _has_cascade(b):
            rows = self._sort_rows_page(rows, b)
        if b.normalize:
            flat = []
            for _u, obj in rows:
                flat.extend(_normalize(obj))
            return flat
        return [obj for _u, obj in rows]

    def _recurse_block(self, b, uids):
        """@recurse (query/recurse.go expandRecurse): breadth-first
        rounds over every uid predicate in the body; with loop=false an
        edge (pred, from, to) is traversed at most once across the
        WHOLE recursion, consumed round-by-round so same-round branches
        share it (matching the engine's flat per-depth step). The node
        payload repeats the same scalar attrs at every level."""
        depth = b.recurse.depth or 10
        depth = min(depth, 10)
        g = self.g
        scalar_attrs = [c for c in b.children if not _is_block(c)]
        uid_preds: list[tuple[str, str]] = []   # (tag, out name)
        for c in b.children:
            if _is_block(c):
                tag = ("~" + c.attr) if c.reverse else c.attr
                uid_preds.append((tag, c.alias if c.alias != c.attr
                                  else tag))
            elif (g.schema.has(c.name.lstrip("~"))
                  and g.schema.get(c.name.lstrip("~")).is_uid):
                uid_preds.append((c.name, c.alias or c.name))
        # BFS rounds with edge-level dedup (loop=false only — loop=true
        # re-traverses edges every round, bounded by depth);
        # steps[level][(uid, tag)] = children of a level-`level` node
        # (root = level 0)
        loop = bool(b.recurse.loop)
        seen: set = set()
        frontier = list(dict.fromkeys(uids))
        steps: list[dict] = []
        for _lvl in range(depth - 1):
            step: dict = {}
            nxt: list[int] = []
            for u in frontier:
                for tag, _o in uid_preds:
                    for o in g.neighbours(u, tag):
                        if not loop and (tag, u, o) in seen:
                            continue
                        step.setdefault((u, tag), []).append(o)
            for (u, tag), os_ in step.items():
                for o in os_:
                    seen.add((tag, u, o))
                    nxt.append(o)
            if not step:
                break
            steps.append(step)
            frontier = list(dict.fromkeys(nxt))

        memo: dict = {}

        def node_obj(u: int, lvl: int) -> dict:
            key = (u, lvl)
            if key in memo:
                return memo[key]
            obj: dict = {}
            memo[key] = obj
            for a in scalar_attrs:
                self._attr(a, b, [u], {u: obj}, [])
            if lvl < len(steps):
                for tag, out in uid_preds:
                    kids = [node_obj(o, lvl + 1)
                            for o in steps[lvl].get((u, tag), [])]
                    kids = [k for k in kids if k]
                    if kids:
                        obj[out] = kids
            return obj

        rows = [node_obj(u, 0) for u in list(dict.fromkeys(uids))]
        return [r for r in rows if r]

    def _groupby_block(self, b, uids):
        """Root-level @groupby (query/groupby.go formResult): one
        (node, key) row per group-key posting of each frontier node,
        grouped by key; groups ordered by (size, key, aggregates) asc
        (groupLess); uid keys render 0x-hex. Returns None when there
        are no groups (the block key is omitted, like the engine)."""
        from collections import Counter

        ga = b.groupby.attrs[0]
        name, out = ga.name, (ga.alias or ga.name)
        g = self.g
        is_uid = name.startswith("~") or name in g.edges or (
            g.schema.has(name) and g.schema.get(name).is_uid)
        keys = []
        for u in uids:
            if is_uid:
                keys.extend(g.neighbours(u, name))
            else:
                keys.extend(v for _l, v in
                            g.scalars.get(name, {}).get(u, []))
        cnt = Counter(keys)
        if not cnt:
            return None
        aggs = [a for a in b.children if not _is_block(a)
                and getattr(a, "is_count", False) and a.name == "uid"]
        rows = []
        for k, n in sorted(cnt.items(), key=lambda kv: (kv[1], kv[0])):
            kv_out = f"0x{k:x}" if is_uid else _render(k)
            row = {out: kv_out}
            for a in aggs:
                row[a.alias or "count"] = n
            rows.append(row)
        return [{"@groupby": rows}]

    def _agg_only_block(self, b) -> list:
        # one single-key node PER aggregate child, in query order
        # (query/outputnode.go one fastJsonNode per aggregate)
        out = []
        for a in b.children:
            if getattr(a, "name", None) in ("min", "max", "sum", "avg") and a.val_var:
                key = a.alias or f"{a.name}(val({a.val_var}))"
                vals = list(self.val_vars[a.val_var][0].values())
                if not vals:
                    out.append({key: None})
                    continue
                if a.name == "min":
                    r = min(vals)
                elif a.name == "max":
                    r = max(vals)
                elif a.name == "sum":
                    r = sum(vals)
                else:
                    r = sum(vals) / len(vals)
                out.append({key: _render(r)})
        return out

    def _root_uids(self, f) -> list[int]:
        name = f.name.lower()
        g = self.g
        if name == "uid":
            out: set[int] = set()
            for a in f.args:
                if a.is_pred or isinstance(a.value, str) and not str(a.value).isdigit():
                    out |= self.uid_vars.get(a.value, set())
                else:
                    out.add(int(a.value))
            return sorted(out)
        if name == "type":
            t = f.args[0].value
            return sorted(u for u, posts in
                          g.scalars.get("dgraph.type", {}).items()
                          if any(v == t for _l, v in posts))
        if name == "has":
            pred = f.args[0].value
            return sorted(g.subjects(pred))
        arg0 = f.args[0]
        if arg0.is_count:  # eq(count(pred), k) / between(count(p), a, b)
            pred = arg0.value
            ks = [int(a.value) for a in f.args[1:]]
            if name == "between":
                lo, hi = ks[0], ks[1]
                if lo <= 0 or hi <= 0:
                    raise ValueError(
                        "count(predicate) cannot be used to search for "
                        "negative counts (nonsensical) or zero counts "
                        "(not tracked).")
                return sorted(u for u in self._count_universe(pred)
                              if lo <= g.count(u, pred) <= hi)
            cmp = _CMPS[name]
            return sorted(u for u in self._count_universe(pred)
                          if any(cmp(g.count(u, pred), k) for k in ks))
        if arg0.is_val_var:
            vals = self.val_vars[arg0.value][0]
            lits = _flatten([a.value for a in f.args[1:]])
            cmp = _CMPS[name]
            return sorted(u for u, v in vals.items()
                          if any(cmp(v, _coerce_lit(ll, v)) for ll in lits))
        pred = arg0.value
        langs = [arg0.lang] if arg0.lang else []
        if "@" in pred:
            pred, _, ltag = pred.partition("@")
            langs = ltag.split(":")
        lits = _flatten([a.value for a in f.args[1:]])
        if name in ("anyofterms", "allofterms"):
            want = _terms(str(lits[0]))
            out = []
            for u in g.scalars.get(pred, {}):
                v = g.value(u, pred, langs)
                if v is None:
                    continue
                toks = set(_terms(str(v)))
                hit = (all(t in toks for t in want) if name == "allofterms"
                       else any(t in toks for t in want))
                if hit and want:
                    out.append(u)
            return sorted(out)
        if name == "regexp":
            pat = str(lits[0])
            m = re.match(r"^/(.*)/([a-z]*)$", pat, re.S)
            body, flags = (m.group(1), m.group(2)) if m else (pat, "")
            rx = re.compile(body, re.I if "i" in flags else 0)
            return sorted(u for u in g.scalars.get(pred, {})
                          if (v := g.value(u, pred, langs)) is not None
                          and rx.search(str(v)))
        if name in ("near", "within", "contains", "intersects"):
            if not g.scalars.get(pred) and not g.edges.get(pred):
                return []
            raise NotImplementedError(f"geo root {name} over live data")
        if name == "between":
            out = []
            for u in g.scalars.get(pred, {}):
                v = g.value(u, pred, langs)
                if v is None:
                    continue
                lo, hi = (_coerce_lit(ll, v) for ll in lits[:2])
                if lo <= v <= hi:
                    out.append(u)
            return sorted(out)
        cmp = _CMPS[name]
        out = []
        for u in g.scalars.get(pred, {}):
            v = g.value(u, pred, langs)
            if v is None:
                continue
            if any(cmp(v, _coerce_lit(ll, v)) for ll in lits):
                out.append(u)
        return sorted(out)

    def _count_universe(self, pred: str):
        """eq(count(p), 0) would need all nodes; corpus uses k>0 so the
        subjects with at least one posting suffice."""
        return self.g.subjects(pred)

    # ------------------------------------------------------------ filters
    def _filter_ok(self, tree, uid: int, path=()) -> bool:
        if tree.op == "and":
            return all(self._filter_ok(c, uid, path) for c in tree.children)
        if tree.op == "or":
            return any(self._filter_ok(c, uid, path) for c in tree.children)
        if tree.op == "not":
            return not self._filter_ok(tree.children[0], uid, path)
        f = tree.func
        name = f.name.lower()
        g = self.g
        if name == "uid":
            allowed: set[int] = set()
            for a in f.args:
                key = a.value
                if isinstance(key, str) and key in self.uid_vars:
                    allowed |= self.uid_vars[key]
                else:
                    allowed.add(int(key))
            return uid in allowed
        if name == "uid_in":
            pred = f.args[0].value
            targets: set[int] = set()
            for a in f.args[1:]:
                key = a.value
                if isinstance(key, str) and key in self.uid_vars:
                    targets |= self.uid_vars[key]
                else:
                    targets.add(int(key))
            return any(n in targets for n in g.neighbours(uid, pred))
        if name == "has":
            return g.has(uid, f.args[0].value)
        if name == "type":
            t = f.args[0].value
            return any(v == t for _l, v in
                       g.scalars.get("dgraph.type", {}).get(uid, []))
        arg0 = f.args[0]
        if arg0.is_count:
            pred = arg0.value
            ks = [int(x) for x in _flatten([a.value for a in f.args[1:]])]
            return any(_CMPS[name](g.count(uid, pred), k) for k in ks)
        if arg0.is_val_var:
            vals = self.val_vars[arg0.value][0]
            if uid not in vals:
                return False
            v = vals[uid]
            lits = _flatten([a.value for a in f.args[1:]])
            return any(_CMPS[name](v, _coerce_lit(ll, v)) for ll in lits)
        pred = arg0.value
        langs = [arg0.lang] if arg0.lang else []
        if "@" in str(pred):
            pred, _, ltag = pred.partition("@")
            langs = ltag.split(":")
        lits = _flatten([a.value for a in f.args[1:]])
        # eq(p, val(v)) — literal is a value-var read
        lit_vals = []
        for a in f.args[1:]:
            if a.is_val_var:
                vv = self.val_vars[a.value][0]
                if uid not in vv:
                    return False
                lit_vals.append(vv[uid])
        if lit_vals:
            lits = lit_vals
        v = g.value(uid, pred, langs)
        if name in ("anyofterms", "allofterms"):
            if v is None:
                return False
            toks = set(_terms(str(v)))
            want = _terms(str(lits[0]))
            return (all(t in toks for t in want) if name == "allofterms"
                    else any(t in toks for t in want))
        if name == "regexp":
            if v is None:
                return False
            m = re.match(r"^/(.*)/([a-z]*)$", str(lits[0]), re.S)
            body, flags = (m.group(1), m.group(2)) if m else (str(lits[0]), "")
            rx = re.compile(body, re.I if "i" in flags else 0)
            return bool(rx.search(str(v)))
        if v is None:
            return False
        if name == "between":
            lo, hi = (_coerce_lit(ll, v) for ll in lits[:2])
            return lo <= v <= hi
        return any(_CMPS[name](v, _coerce_lit(ll, v)) for ll in lits)

    # ------------------------------------------------------------ descent
    def _descend(self, block, frontier, chain, cascading=False):
        """frontier: list[(parent, uid)] (parent None at root). Returns
        (rows: list[(uid, obj)], _).

        Children process in syntactic order; value vars register with
        their defining chain so level aggregates / math propagation can
        walk it (query/query.go transformTo / evalLevelAgg)."""
        nodes = sorted({u for _p, u in frontier})
        objs: dict[int, dict] = {u: {} for u in nodes}

        for child in block.children:
            if _is_block(child):
                self._child_block(child, nodes, objs, chain, cascading)
            else:
                self._attr(child, block, nodes, objs, chain)

        dropped: set[int] = set()
        if cascading:
            # @cascade applies to the whole subtree: a node missing ANY
            # requested child is removed (query/query.go applyCascade)
            req = _cascade_keys(block)
            for u in nodes:
                if any(k not in objs[u] for k in req):
                    dropped.add(u)
        rows = [(u, objs[u]) for u in nodes if u not in dropped]
        return rows, None

    def _child_block(self, child, nodes, objs, chain, cascading):
        pred = child.attr
        reverse = child.reverse or (pred or "").startswith("~")
        pname = (pred or "").lstrip("~")
        edges = []  # (parent, dst)
        for u in nodes:
            for d in (self.g.inc(u, pname) if reverse else self.g.out(u, pname)):
                edges.append((u, d))

        def _ef(u, d):
            # facets live on the FORWARD edge regardless of traversal
            # direction (worker/task.go facets fetch)
            key = (pname, d, u) if reverse else (pname, u, d)
            return self.g.efacets.get(key, {})

        fs = child.facets
        if fs is not None and fs.filter is not None:
            edges = [(u, d) for u, d in edges
                     if self._facet_ok(fs.filter, _ef(u, d))]
        if child.filter is not None:
            edges = [(u, d) for u, d in edges if self._filter_ok(child.filter, d)]
        # variables see the pre-pagination edge set
        pre_page = list(edges)
        if child.var:
            self.uid_vars[child.var] = {d for _u, d in pre_page}
        sub_cascading = cascading or child.cascade is not None
        edges_by_parent: dict[int, list[int]] = {}
        if sub_cascading:
            # under @cascade, pagination DEFERS until after cascade
            # pruning (query/query.go:3004 applyPagination ordering):
            # descend the FULL edge set, paginate the survivors below
            for u, d in pre_page:
                edges_by_parent.setdefault(u, []).append(d)
        elif fs is not None and fs.order:
            # @facets(orderasc: k): per-parent sort by the edge facet,
            # then first/offset (query/query.go:2611
            # sortAndPaginateUsingFacet)
            o = fs.order[0]
            by_p: dict[int, list[int]] = {}
            for u, d in pre_page:
                by_p.setdefault(u, []).append(d)
            lo = child.offset or 0
            for u, ds in by_p.items():
                ds.sort(key=lambda d: _OrderKey(
                    _ef(u, d).get(o.key), o.desc))
                hi = lo + child.first if child.first is not None else None
                edges_by_parent[u] = ds[lo:hi]
        else:
            for u, d in self._page_edges(pre_page, child):
                edges_by_parent.setdefault(u, []).append(d)
        sub_chain = chain + [pre_page]
        sub_frontier = [(u, d) for u, ds in edges_by_parent.items() for d in ds]
        if not sub_frontier:
            self._register_empty_vars(child)
            return
        sub_rows, _ = self._descend(
            child, sub_frontier, sub_chain, sub_cascading)
        by_uid = dict(sub_rows)
        key = child.alias
        if reverse and key == pname:
            key = "~" + pname  # unaliased reverse edges render with ~
        for u in nodes:
            ds = edges_by_parent.get(u, [])
            if sub_cascading:
                survivors = [d for d in ds if d in by_uid and by_uid[d]]
                paged = self._page_edges(
                    [(u, d) for d in survivors], child)
                kids = [by_uid[d] for _u, d in paged]
            else:
                kids = [by_uid[d] for d in ds
                        if d in by_uid and by_uid[d]]
            if kids and fs is not None and (fs.keys or fs.all
                                            or fs.order):
                # @facets(k) output: each child carries `<childkey>|<k>`
                # siblings for the facets present on ITS edge
                out_kids = []
                for d, kid in zip(
                        (d for d in ds if d in by_uid and by_uid[d]),
                        kids):
                    fd = _ef(u, d)
                    extra = {}
                    if fs.keys:
                        names = [(k, a) for k, a in fs.keys]
                    elif fs.all:
                        names = [(k, None) for k in sorted(fd)]
                    else:
                        names = []
                    # @facets(orderasc: k) also emits the ordered key
                    # as a sibling (golden TestOrderFacets)
                    for o in fs.order:
                        if all(k != o.key for k, _a in names):
                            names.append((o.key, None))
                    for k, a in names:
                        if k in fd:
                            extra[f"{key}|{a or k}"] = _render(fd[k])
                    out_kids.append({**kid, **extra})
                objs[u][key] = out_kids
            elif kids:
                objs[u][key] = kids

    def _descend_reflex(self, block, uid, path: set[int]) -> dict:
        """@ignorereflex: per-path descent; a child equal to any uid on
        the root→parent path is dropped (query/query.go removeReflexive).
        Value-var machinery is not supported under this directive."""
        obj: dict = {}
        for child in block.children:
            if not _is_block(child):
                self._attr(child, block, [uid], {uid: obj}, [])
                continue
            pname = (child.attr or "").lstrip("~")
            reverse = child.reverse or (child.attr or "").startswith("~")
            ds = (self.g.inc(uid, pname) if reverse else self.g.out(uid, pname))
            ds = [d for d in ds if d not in path]
            if child.filter is not None:
                ds = [d for d in ds if self._filter_ok(child.filter, d)]
            ds = self._sort_uids(sorted(set(ds)), child)
            lo = child.offset or 0
            if child.first is not None:
                ds = ds[lo:lo + child.first]
            elif lo:
                ds = ds[lo:]
            kids = []
            for d in ds:
                o = self._descend_reflex(child, d, path | {d})
                if o:
                    kids.append(o)
            if kids:
                obj[child.alias] = kids
        return obj

    def _facet_ok(self, tree, fd: dict) -> bool:
        """@facets(...) edge filter over one edge's typed facet dict."""
        if tree.op == "and":
            return all(self._facet_ok(c, fd) for c in tree.children)
        if tree.op == "or":
            return any(self._facet_ok(c, fd) for c in tree.children)
        if tree.op == "not":
            return not self._facet_ok(tree.children[0], fd)
        f = tree.func
        name = f.name.lower()
        k = f.args[0].value
        if name == "has":
            return k in fd
        if k not in fd:
            return False
        v = fd[k]
        lits = _flatten([a.value for a in f.args[1:]])
        if name in ("anyofterms", "allofterms"):
            toks = set(_terms(str(v)))
            want = _terms(str(lits[0]))
            return (all(t in toks for t in want) if name == "allofterms"
                    else any(t in toks for t in want))
        if name == "between":
            lo, hi = (_coerce_lit(ll, v) for ll in lits[:2])
            return lo <= v <= hi
        return any(_CMPS[name](v, _coerce_lit(ll, v)) for ll in lits)

    def _register_empty_vars(self, block) -> None:
        if block.var:
            self.uid_vars.setdefault(block.var, set())
        for c in block.children:
            if _is_block(c):
                self._register_empty_vars(c)
            elif getattr(c, "var", None):
                self.val_vars.setdefault(c.var, ({}, []))

    def _page_edges(self, edges, block):
        """Per-parent sort + first/offset (worker/sort.go)."""
        by_parent: dict[int, list[int]] = {}
        for u, d in edges:
            by_parent.setdefault(u, []).append(d)
        out = []
        for u, ds in by_parent.items():
            ds = self._sort_uids(sorted(set(ds)), block)
            lo = block.offset or 0
            first = block.first
            if first is not None and first < 0:
                ds = ds[len(ds) + first - lo:len(ds) - lo if lo else None]
            else:
                ds = ds[lo:lo + first if first is not None else None]
            out.extend((u, d) for d in ds)
        return out

    def _sort_uids(self, uids, block):
        if not block.order:
            return sorted(uids)
        keys = []
        for o in block.order:
            if o.is_var:
                vals = self.val_vars.get(o.key, ({}, []))[0]
                # sorting by a value var KEEPS ONLY uids the var maps
                # (worker/sort.go sortWithVar semantics)
                uids = [u for u in uids if u in vals]
                keys.append((lambda u, vals=vals: vals.get(u), o.desc))
            else:
                k, langs = o.key, [o.lang] if o.lang else []
                if "@" in k:
                    k, _, ltag = k.partition("@")
                    langs = ltag.split(":")

                def fn(u, k=k, langs=langs):
                    v = self.g.value(u, k, langs)
                    if langs and isinstance(v, str):
                        return _collate_en(v)  # lang-tagged: collation
                    return v

                keys.append((fn, o.desc))

        def sort_key(u):
            parts = []
            for fn, desc in keys:
                v = fn(u)
                parts.append(_OrderKey(v, desc))
            parts.append(u)
            return parts

        return sorted(uids, key=sort_key)

    def _sort_page(self, uids, block, defer_page=False):
        uids = self._sort_uids(uids, block)
        if defer_page:
            return uids
        lo = block.offset or 0
        first = block.first
        if first is not None and first < 0:
            return uids[len(uids) + first:]
        return uids[lo:lo + first if first is not None else None]

    def _sort_rows_page(self, rows, block):
        order = {u: i for i, u in enumerate(
            self._sort_uids([u for u, _ in rows], block))}
        rows = sorted(rows, key=lambda r: order[r[0]])
        lo = block.offset or 0
        first = block.first
        if first is not None:
            rows = rows[lo:lo + first]
        elif lo:
            rows = rows[lo:]
        return rows

    # ------------------------------------------------------------ attrs
    def _attr(self, a, block, nodes, objs, chain):
        g = self.g
        name = a.name
        if name == "uid" and not a.is_count:
            for u in nodes:
                objs[u][a.alias or "uid"] = f"0x{u:x}"
            return
        if a.math is not None:
            vals = {u: self._math(a.math, u, chain) for u in nodes}
            vals = {u: v for u, v in vals.items() if v is not None}
            if a.var:
                self.val_vars[a.var] = (vals, list(chain))
            if a.alias:
                for u, v in vals.items():
                    objs[u][a.alias] = _render(v)
            return
        if a.is_count and name != "uid":
            vals = {}
            for u in nodes:
                if a.filter is not None:
                    pn = name.lstrip("~")
                    ds = (g.inc(u, pn) if name.startswith("~") else g.out(u, pn))
                    vals[u] = sum(1 for d in ds if self._filter_ok(a.filter, d))
                else:
                    vals[u] = g.count(u, name)
            if a.var:
                self.val_vars[a.var] = (vals, list(chain))
            # `v as count(p)` ALSO prints under count(p) — var
            # assignment does not suppress output (reference
            # query0_test.go TestQueryVarValAggOrderDesc: the info
            # block emits count(friend) for `s as count(friend)`)
            key = a.alias or f"count({name})"
            for u in nodes:
                objs[u][key] = vals[u]
            return
        if name in ("min", "max", "sum", "avg") and a.val_var:
            vals = self._level_agg(a, chain)
            if a.var:
                self.val_vars[a.var] = (vals, list(chain))
            else:
                key = a.alias or f"{a.name}(val({a.val_var}))"
                for u in nodes:
                    if u in vals:
                        objs[u][key] = _render(vals[u])
            return
        if a.val_var and name == "val":
            src, _chain = self.val_vars.get(a.val_var, ({}, []))
            key = a.alias or f"val({a.val_var})"
            for u in nodes:
                if u in src:
                    objs[u][key] = _render(src[u])
            return
        # plain scalar predicate
        langs = list(a.langs)
        vals = {}
        for u in nodes:
            v = g.value(u, name, langs)
            if v is not None:
                vals[u] = v
        if a.var:
            self.val_vars[a.var] = (vals, list(chain))
            if a.alias is None:
                return  # pure var definition: no output key
        key = a.alias or (name + ("@" + ":".join(langs) if langs else ""))
        for u, v in vals.items():
            objs[u][key] = _render(v)

    def _level_agg(self, a, chain):
        """x as min/max/sum/avg(val(v)) — v defined at a DESCENDANT level
        of the current block chain: propagate by summing along the
        intermediate hops, apply the aggregate at the last hop
        (query/query.go transformTo + evalLevelAgg)."""
        src_vals, src_chain = self.val_vars[a.val_var]
        hops = src_chain[len(chain):]
        if not hops:
            # defined at this very level: the reference rejects this
            # ("Invalid variable aggregation"); corpus never does it
            return {}
        cur = dict(src_vals)
        # sum up through intermediate levels
        for level_edges in reversed(hops[1:]):
            nxt: dict[int, object] = {}
            for p, c in level_edges:
                if c in cur:
                    nxt[p] = nxt.get(p, 0) + cur[c]
            cur = nxt
        # requested aggregate at the last hop
        groups: dict[int, list] = {}
        for p, c in hops[0]:
            if c in cur:
                groups.setdefault(p, []).append(cur[c])
        out = {}
        for p, vs in groups.items():
            if a.name == "min":
                out[p] = min(vs)
            elif a.name == "max":
                out[p] = max(vs)
            elif a.name == "sum":
                out[p] = sum(vs)
            else:
                out[p] = sum(vs) / len(vs)
        return out

    def _math(self, node, uid, chain):
        if node.op is None:
            if node.const is not None:
                return node.const
            vals, src_chain = self.val_vars[node.var]
            v = self._propagated(vals, src_chain, chain, uid)
            return v
        args = [self._math(c, uid, chain) for c in node.children]
        if any(x is None for x in args):
            return None
        op = node.op
        if op == "+":
            return args[0] + args[1] if len(args) > 1 else args[0]
        if op == "-":
            return args[0] - args[1] if len(args) > 1 else -args[0]
        if op == "*":
            return args[0] * args[1]
        if op == "/":
            if isinstance(args[0], int) and isinstance(args[1], int):
                return int(args[0] / args[1])
            return args[0] / args[1]
        if op == "%":
            return args[0] % args[1]
        if op == "min":
            return min(args)
        if op == "max":
            return max(args)
        if op == "floor":
            import math as _m
            return _m.floor(args[0])
        if op == "ceil":
            import math as _m
            return _m.ceil(args[0])
        if op == "sqrt":
            import math as _m
            # engine F.sqrt yields NaN out of domain, not an error
            return _m.sqrt(args[0]) if args[0] >= 0 else _m.nan
        if op == "exp":
            import math as _m
            return _m.exp(args[0])
        if op == "ln":
            import math as _m
            # Go math.Log(0) = -Inf rendered as -MaxFloat64 (matches
            # the engine's mathexpr.py special case); negative -> NaN
            # like Spark's log()
            if args[0] == 0:
                return -1.7976931348623157e308
            return _m.log(args[0]) if args[0] > 0 else _m.nan
        if op == "pow":
            # Spark F.pow yields NaN for negative base ^ fractional
            # exponent (java.lang.Math.pow), never a complex number
            try:
                v = float(args[0]) ** float(args[1])
            except (OverflowError, ZeroDivisionError):
                import math as _m
                return _m.nan
            if isinstance(v, complex):
                import math as _m
                return _m.nan
            return v
        if op == "logbase":
            import math as _m
            if args[0] <= 0 or args[1] <= 0:
                return _m.nan
            return _m.log(args[0]) / _m.log(args[1])
        if op == "cond":
            return args[1] if args[0] else args[2]
        if op in ("<", ">", "<=", ">=", "==", "!="):
            a, b = args
            return {"<": a < b, ">": a > b, "<=": a <= b,
                    ">=": a >= b, "==": a == b, "!=": a != b}[op]
        raise NotImplementedError(f"math op {op}")

    def _propagated(self, vals, src_chain, chain, uid):
        """val(v) read at a level other than v's definition level: values
        propagate DOWN by summing over parents, path-multiplicity included
        (query/query.go transformTo)."""
        if len(src_chain) >= len(chain):
            return vals.get(uid)
        # walk down from definition level to current level
        cur = dict(vals)
        for level_edges in chain[len(src_chain):]:
            nxt: dict[int, object] = {}
            for p, c in level_edges:
                if p in cur:
                    nxt[c] = nxt.get(c, 0) + cur[p]
            cur = nxt
        return cur.get(uid)


class _OrderKey:
    """Sort key wrapper: None sorts after any value; desc inverts."""

    __slots__ = ("v", "desc")

    def __init__(self, v, desc):
        self.v = v
        self.desc = desc

    def _rank(self):
        return (self.v is None, self.v)

    def __lt__(self, other):
        a, b = self, other
        if a.v is None or b.v is None:
            return (b.v is None) and (a.v is not None)
        if a.desc:
            return b.v < a.v
        return a.v < b.v

    def __eq__(self, other):
        return self.v == other.v


def _flatten(lits):
    out = []
    for x in lits:
        if isinstance(x, (list, tuple)):
            out.extend(x)
        else:
            out.append(x)
    return out


_CMPS = {
    "eq": lambda a, b: a == b,
    "le": lambda a, b: a <= b,
    "lt": lambda a, b: a < b,
    "ge": lambda a, b: a >= b,
    "gt": lambda a, b: a > b,
}


def _coerce_lit(lit, sample):
    if isinstance(sample, datetime) and isinstance(lit, str):
        return _parse_dt(lit)
    if isinstance(sample, datetime) and isinstance(lit, int):
        return _parse_dt(str(lit))
    if isinstance(sample, (int, float)) and isinstance(lit, str):
        try:
            return type(sample)(lit)
        except ValueError:
            return lit
    return lit


def _is_block(x) -> bool:
    return hasattr(x, "children") and hasattr(x, "alias")


def _has_cascade(b) -> bool:
    if b.cascade is not None:
        return True
    return any(_has_cascade(c) for c in b.children if _is_block(c))


def _cascade_keys(block) -> list[str]:
    keys = []
    for c in block.children:
        if _is_block(c):
            keys.append(c.alias)
        else:
            if c.math is not None or c.var and not c.alias:
                continue
            if c.name == "uid":
                continue
            if c.is_count:
                keys.append(c.alias or f"count({c.name})")
            elif c.val_var and c.name == "val":
                keys.append(c.alias or f"val({c.val_var})")
            elif c.name in ("min", "max", "sum", "avg") and c.val_var:
                keys.append(c.alias or f"{c.name}(val({c.val_var}))")
            else:
                langs = "@" + ":".join(c.langs) if c.langs else ""
                keys.append(c.alias or c.name + langs)
    return keys


def _read_vars(b) -> set[str]:
    """All variable names a block READS (root func, filters, order,
    val()/aggregate attrs, math) minus the ones it defines."""
    reads: set[str] = set()
    defines: set[str] = set()

    def from_func(f):
        if f is None:
            return
        for a in f.args:
            if a.is_val_var or a.is_len:
                reads.add(a.value)
            elif f.name.lower() == "uid" and (a.is_pred or (
                    isinstance(a.value, str) and not str(a.value).isdigit())):
                reads.add(a.value)
            elif f.name.lower() == "uid_in" and a is not f.args[0] and (
                    isinstance(a.value, str)
                    and not str(a.value).isdigit()):
                reads.add(a.value)

    def from_tree(t):
        if t is None:
            return
        if t.op == "func":
            from_func(t.func)
        for c in t.children:
            from_tree(c)

    def from_math(m):
        if m is None:
            return
        if m.var:
            reads.add(m.var)
        for c in m.children:
            from_math(c)

    def walk(blk):
        from_func(getattr(blk, "func", None))
        from_tree(getattr(blk, "filter", None))
        for o in getattr(blk, "order", []) or []:
            if o.is_var:
                reads.add(o.key)
        if getattr(blk, "var", None):
            defines.add(blk.var)
        for c in blk.children:
            if _is_block(c):
                walk(c)
            else:
                if c.var:
                    defines.add(c.var)
                if c.val_var:
                    reads.add(c.val_var)
                from_math(c.math)
                from_tree(c.filter)

    walk(b)
    return reads - defines


def _normalize(obj: dict) -> list[dict]:
    """@normalize flattening: keep aliased leaves, cartesian across
    child lists (query/outputnode.go normalize)."""
    base = {k: v for k, v in obj.items() if not isinstance(v, list)
            or not (v and isinstance(v[0], dict))}
    acc = [dict(base)]
    for k, v in obj.items():
        if isinstance(v, list) and v and isinstance(v[0], dict):
            flats = []
            for childobj in v:
                flats.extend(_normalize(childobj))
            if flats:
                acc = [{**a, **f} for a in acc for f in flats]
    return acc
