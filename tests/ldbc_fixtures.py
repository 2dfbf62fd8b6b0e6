"""Per-query LDBC fixture synthesis: invert each unpinned corpus query's
pinned answer (systest/ldbc/test_cases.yaml) into the minimal triple set
that closes it, so the full 19-case suite is value-verified, not just
executed.

Each builder gets the parsed pinned resp and returns N-Quad lines for a
STANDALONE graph (no sharing with the IS-suite fixture): interactions
between cases can't silently change an answer page. Entities use
explicit <0x...> uids allocated in pinned-row order, so order ties that
dgraph breaks by ascending uid (worker/sort.go stable sort over
uid-ordered lists) reproduce exactly.
"""

from __future__ import annotations

PERSON_ROOT = 4398046514948  # "p1" in the corpus: most IC queries' root


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


class FixtureBuilder:
    def __init__(self, base: int = 0x100000):
        self.lines: list[str] = []
        self._next = base
        self._by_key: dict = {}

    def uid(self) -> str:
        self._next += 1
        return f"0x{self._next:x}"

    def node(self, key, typ: str | None = None, **scalars) -> str:
        """Get-or-create a node for a dedup key; scalars only written on
        first creation."""
        if key in self._by_key:
            return self._by_key[key]
        u = self.uid()
        self._by_key[key] = u
        if typ:
            self.value(u, "dgraph.type", typ)
        for pred, val in scalars.items():
            if val is not None:
                self.value(u, pred, val)
        return u

    def value(self, u: str, pred: str, val) -> None:
        if isinstance(val, bool):
            lit = f'"{str(val).lower()}"^^<bool>'
        elif isinstance(val, int):
            lit = f'"{val}"^^<int>'
        elif isinstance(val, float):
            lit = f'"{val}"^^<float>'
        elif isinstance(val, (list, tuple)):
            for v in val:
                self.value(u, pred, v)
            return
        else:
            lit = f'"{_esc(str(val))}"'
        line = f"<{u}> <{pred}> {lit} ."
        if line not in self._by_key:  # identical postings are idempotent
            self._by_key[line] = line
            self.lines.append(line)

    def edge(self, src: str, pred: str, dst: str,
             facets: dict | None = None) -> None:
        fac = ""
        if facets:
            fac = " (" + ", ".join(f"{k}={v}" for k, v in facets.items()) + ")"
        line = f"<{src}> <{pred}> <{dst}>{fac} ."
        if line not in self._by_key:  # repeated wiring collapses (uid sets)
            self._by_key[line] = line
            self.lines.append(line)

    # ---------------------------------------------------------- shared bits
    def person(self, row: dict | None = None, *, key=None, typ="person",
               **extra) -> str:
        """Person node from a resp row ({id, firstName, lastName, ...})."""
        row = row or {}
        pid = row.get("id", extra.get("id"))
        k = ("person", key if key is not None else pid)
        created = k not in self._by_key
        u = self.node(k, typ)
        if created:  # repeated creators must not duplicate value triples
            for pred in ("id", "firstName", "lastName", "gender",
                         "browserUsed", "locationIP", "birthday",
                         "creationDate", "fqid"):
                v = row.get(pred, extra.get(pred))
                if v is not None:
                    self.value(u, pred, v)
        return u

    def message(self, row: dict, creator: str, typ: str = "post") -> str:
        """Message node from a resp row ({id, content, creationDate})."""
        u = self.node(("message", row["id"]), typ)
        self.value(u, "id", row["id"])
        if "content" in row:
            self.value(u, "content", row["content"])
        if "creationDate" in row:
            self.value(u, "creationDate", row["creationDate"])
        # orderasc: fqid tie-break in IC02 — ascending in pinned order
        self.value(u, "fqid", f"msg_{len(self._by_key):06d}")
        self.edge(u, "hasCreator", creator)
        return u


# ---------------------------------------------------------------
# fixture self-checks (round-7): every synthesized graph is
# re-derived NAIVELY from its raw triples (regex parse, dict walks —
# nothing shared with the engine OR the builders' bookkeeping) and
# the pinned ordering/count/flag properties are re-asserted, so a
# fixture-synthesis bug cannot silently align with an engine bug
# (the IC01 dict-BFS pattern, extended to the other eight).
# ---------------------------------------------------------------
import re as _re


def _parse_fx(lines: list[str]):
    """raw triples -> (scalars[(uid, pred)] = [values], edges =
    [(src, pred, dst, facets)])."""
    scalars: dict = {}
    edges: list = []
    for ln in lines:
        m = _re.match(
            r"<([^>]+)> <([^>]+)> <([^>]+)>(?: \(([^)]*)\))? \.$", ln)
        if m:
            fac = {}
            if m.group(4):
                for kv in m.group(4).split(", "):
                    k, v = kv.split("=", 1)
                    fac[k] = v.strip('"')
            edges.append((m.group(1), m.group(2), m.group(3), fac))
            continue
        m = _re.match(
            r'<([^>]+)> <([^>]+)> "((?:[^"\\]|\\.)*)"'
            r"(?:\^\^<[^>]+>)? \.$", ln)
        if m:
            scalars.setdefault((m.group(1), m.group(2)), []).append(
                m.group(3))
    return scalars, edges


def _val(sc, uid, pred):
    v = sc.get((uid, pred))
    return v[0] if v else None


def _check_recent_messages(lines, rows, hops_root, id_key="id"):
    """Messages by root-adjacent creators sorted (creationDate desc,
    fqid asc) must reproduce the pinned id sequence."""
    sc, ed = _parse_fx(lines)
    friends = {o for s, p, o, _f in ed if p == "knows" and s == hops_root}
    msgs = [s for s, p, o, _f in ed if p == "hasCreator" and o in friends]
    key = lambda m: (_val(sc, m, "creationDate"), _val(sc, m, "fqid"))
    msgs.sort(key=lambda m: (_neg_str(key(m)[0]), key(m)[1]))
    got = [_val(sc, m, id_key) for m in msgs[:len(rows)]]
    want = [str(r[id_key]) for r in rows]
    assert got == want, f"recent-messages order: {got} != {want}"


class _neg_str(str):
    """Inverted string ordering for descending sort keys."""

    def __lt__(self, other):  # type: ignore[override]
        return str.__gt__(self, other)


# ===================================================================
# IC02 (q9): 20 most recent messages by p1's friends before a cutoff,
# (creationDate desc, fqid asc). Fixture: p1 knows each creator; one
# message node per pinned row.
# ===================================================================
def fx_q9(resp: dict) -> list[str]:
    b = FixtureBuilder()
    p1 = b.person(key="root", id=PERSON_ROOT)
    for row in resp["q"]:
        creator = b.person(row["hasCreator"][0])
        b.edge(p1, "knows", creator)
        b.message(row, creator)
    _check_recent_messages(b.lines, resp["q"], p1)
    return b.lines


# ===================================================================
# IC08 (q14): 20 most recent replies to p1's messages,
# (creationDate desc, id asc). Fixture: one post by p1; each pinned
# reply replyOf that post.
# ===================================================================
def fx_q14(resp: dict) -> list[str]:
    b = FixtureBuilder()
    p1 = b.person(key="root", id=PERSON_ROOT)
    root_post = b.node(("rootpost",), "post")
    b.value(root_post, "id", 1)
    b.edge(root_post, "hasCreator", p1)
    for row in resp["q"]:
        creator = b.person(row["hasCreator"][0])
        m = b.message(row, creator, typ="comment")
        b.edge(m, "replyOf", root_post)
    # self-check: replies to root's post sorted (creationDate desc,
    # numeric id asc) reproduce the pinned sequence
    sc, ed = _parse_fx(b.lines)
    reps = [s_ for s_, p_, o_, _f in ed
            if p_ == "replyOf" and o_ == root_post]
    reps.sort(key=lambda m: (_neg_str(_val(sc, m, "creationDate")),
                             int(_val(sc, m, "id"))))
    got = [int(_val(sc, m, "id")) for m in reps[:len(resp["q"])]]
    want = [int(r["id"]) for r in resp["q"]]
    assert got == want, f"q14 reply order: {got} != {want}"
    return b.lines


# ===================================================================
# IC09 (q15): 20 most recent messages by friends AND friends-of-friends
# of p1 before a cutoff, (creationDate desc, id asc). Friend-level
# membership is enough — every creator is wired as a direct friend.
# ===================================================================
def fx_q15(resp: dict) -> list[str]:
    b = FixtureBuilder()
    p1 = b.person(key="root", id=PERSON_ROOT)
    for row in resp["q1"]:
        creator = b.person(row["hasCreator"][0])
        b.edge(p1, "knows", creator)
        b.message(row, creator)
    _check_recent_messages(b.lines, resp["q1"], p1)
    return b.lines

# ===================================================================
# IC07 (q13): top-20 likers of p102's messages (orderdesc id), with
# isFriend1 for direct friends and the most recent like per person
# rendered with its creationDate facet. Fixture: one message per
# distinct liked id; one like edge per pinned person; friends wired for
# isFriend1 rows; one dummy inbound friend keeps the @cascade var block
# alive without entering the page (no likes).
# ===================================================================
def fx_q13(resp: dict) -> list[str]:
    b = FixtureBuilder()
    p102 = b.person(key="root", id=102)
    msgs = {}
    for row in resp["q"]:
        like = row["likes"][0]
        if like["id"] not in msgs:
            msgs[like["id"]] = b.message(
                {"id": like["id"], "creationDate": like["creationDate"]}, p102)
    dummy = b.person(key="dummy_inbound")
    b.edge(dummy, "knows", p102)
    for row in resp["q"]:
        person = b.person(row)
        if row.get("isFriend1"):
            b.edge(p102, "knows", person)
        like = row["likes"][0]
        b.edge(person, "likes", msgs[like["id"]],
               facets={"creationDate": like["likes|creationDate"]})
    # self-check: every liker's like maps to a message created by the
    # root, isFriend1 matches the knows wiring, and the pinned rows
    # run in non-increasing like-date order
    sc, ed = _parse_fx(b.lines)
    root_msgs = {s_ for s_, p_, o_, _f in ed
                 if p_ == "hasCreator" and o_ == p102}
    friends = {o_ for s_, p_, o_, _f in ed
               if p_ == "knows" and s_ == p102}
    likes = {s_: (o_, f) for s_, p_, o_, f in ed if p_ == "likes"}
    uid_of_id = {_val(sc, u, "id"): u for (u, pr) in sc
                 if pr == "id"}
    prev = None
    for row in resp["q"]:
        u = uid_of_id[str(row["id"])]
        msg, fac = likes[u]
        assert msg in root_msgs, f"q13: like target not root's message"
        assert fac["creationDate"] == row["likes"][0]["likes|creationDate"]
        assert bool(row.get("isFriend1")) == (u in friends), \
            f"q13 isFriend1 mismatch for {row['id']}"
        # the query orders by id DESC (orderdesc: id, first: 20)
        d = int(row["id"])
        assert prev is None or d <= prev, "q13 ids not descending"
        prev = d
    return b.lines


# ===================================================================
# IC06 (q12): top-10 tags co-occurring with "Rumi" on friend-authored
# posts, orderdesc count. Count ties break by ascending tag uid, so tag
# nodes are allocated FIRST, in pinned order.
# ===================================================================
def fx_q12(resp: dict) -> list[str]:
    b = FixtureBuilder()
    p102 = b.person(key="root", id=102)
    friend = b.person(key="friend")
    b.edge(p102, "knows", friend)
    rumi = b.node(("tag", "Rumi"), "tag")
    b.value(rumi, "name", "Rumi")
    tags = []
    for row in resp["q"]:  # pinned order -> ascending uid within count ties
        t = b.node(("tag", row["name"]), "tag")
        b.value(t, "name", row["name"])
        tags.append((t, row["postCount"]))
    for t, count in tags:
        for i in range(count):
            p = b.node(("post", t, i), "post")
            b.edge(p, "hasCreator", friend)
            b.edge(p, "hasTag", rumi)
            b.edge(p, "hasTag", t)
    # self-check: co-occurrence counts recomputed from the triples
    # match the pinned postCounts, in non-increasing order with count
    # ties broken by ascending tag uid (allocation order)
    sc, ed = _parse_fx(b.lines)
    by_post: dict = {}
    for s_, p_, o_, _f in ed:
        if p_ == "hasTag":
            by_post.setdefault(s_, set()).add(o_)
    counts: dict = {}
    for post, ts in by_post.items():
        if rumi in ts:
            for t_ in ts - {rumi}:
                counts[t_] = counts.get(t_, 0) + 1
    order = sorted(counts, key=lambda t_: (-counts[t_], int(t_, 16)))
    got = [(_val(sc, t_, "name"), counts[t_]) for t_ in order]
    want = [(r["name"], r["postCount"]) for r in resp["q"]]
    assert got == want, f"q12 tag counts: {got} != {want}"
    return b.lines


# ===================================================================
# IC10 (q16): friends-of-friends of p933 scored by posts tagged with
# p933's interests (common) minus other posts (uncommon), orderdesc
# interest. Zero-count rows pin dgraph's count-of-empty == 0. Interest
# ties break by ascending person uid -> persons allocated in pinned
# order before any posts.
# ===================================================================
def fx_q16(resp: dict) -> list[str]:
    b = FixtureBuilder()
    p933 = b.person(key="root", id=933)
    mid = b.person(key="mid")  # the exf1 hop; no posts, no firstName
    b.edge(p933, "knows", mid)
    interest = b.node(("tag", "interest"), "tag")
    b.value(interest, "fqid", "tag_interest")
    other = b.node(("tag", "other"), "tag")
    b.value(other, "fqid", "tag_other")
    b.edge(p933, "hasInterest", interest)
    people = []
    for row in resp["q"]:
        person = b.person(row, key=row["fqid"])
        b.edge(mid, "knows", person)
        for city in row.get("isLocatedIn", []):
            c = b.node(("place", city["name"]), "place")
            b.value(c, "name", city["name"])
            b.edge(person, "isLocatedIn", c)
        people.append((person, row["co"], row["un"]))
    for person, co, un in people:
        for i in range(co):
            p = b.node(("post", person, "co", i), "post")
            b.edge(p, "hasCreator", person)
            b.edge(p, "hasTag", interest)
        for i in range(un):
            p = b.node(("post", person, "un", i), "post")
            b.edge(p, "hasCreator", person)
            b.edge(p, "hasTag", other)
    # self-check: per-person common/uncommon post counts recomputed
    # from the triples match the pinned co/un, and the pinned rows run
    # in non-increasing interest (co - un) with ties by ascending uid
    sc, ed = _parse_fx(b.lines)
    by_creator: dict = {}
    tags_of: dict = {}
    for s_, p_, o_, _f in ed:
        if p_ == "hasCreator":
            by_creator.setdefault(o_, []).append(s_)
        elif p_ == "hasTag":
            tags_of.setdefault(s_, set()).add(o_)
    prev = None
    for row in resp["q"]:
        u = next(uu for (uu, pr), vv in sc.items()
                 if pr == "fqid" and vv[0] == row["fqid"])
        posts = by_creator.get(u, [])
        co_n = sum(1 for pp in posts if interest in tags_of.get(pp, ()))
        un_n = sum(1 for pp in posts if other in tags_of.get(pp, ()))
        assert (co_n, un_n) == (row["co"], row["un"]), \
            f"q16 counts for {row['fqid']}: {(co_n, un_n)}"
        score = (co_n - un_n, -int(u, 16))
        assert prev is None or score <= prev, "q16 interest not sorted"
        prev = score
    return b.lines


# ===================================================================
# IC12 (q18): friends of p102 ranked by replies to posts tagged under
# the "Artist" tagclass tree, orderdesc replyCount (ties: person uid).
# Generates sum(replyCount) comment nodes (~4.3k) programmatically.
# ===================================================================
def fx_q18(resp: dict) -> list[str]:
    b = FixtureBuilder()
    artist = b.node(("tagclass", "Artist"), "tagclass")
    b.value(artist, "name", "Artist")
    tag = b.node(("tag", "artist_tag"), "tag")
    b.edge(tag, "hasType", artist)
    author = b.person(key="post_author")
    post = b.node(("post", "relevant"), "post")
    b.edge(post, "hasCreator", author)
    b.edge(post, "hasTag", tag)
    p102 = b.person(key="root", id=102)
    people = []
    for row in resp["q"]:  # pinned order -> ascending uid for the 181-tie
        person = b.person(row)
        b.edge(p102, "knows", person)
        people.append((person, row["replyCount"]))
    for person, count in people:
        for i in range(count):
            c = b.node(("comment", person, i), "comment")
            b.edge(c, "hasCreator", person)
            b.edge(c, "replyOf", post)
    # self-check: per-friend reply counts to artist-tagged posts
    # recomputed from the triples match the pinned replyCount, in
    # non-increasing order with ties by ascending person uid
    sc, ed = _parse_fx(b.lines)
    tagged = {s_ for s_, p_, o_, _f in ed
              if p_ == "hasTag" and o_ == tag}
    assert post in tagged or any(
        p_ == "hasTag" for s_, p_, o_, _f in ed if s_ == post), \
        "q18 post not tagged"
    replies_to_artist = {s_ for s_, p_, o_, _f in ed
                         if p_ == "replyOf" and o_ == post}
    by_creator2: dict = {}
    for s_, p_, o_, _f in ed:
        if p_ == "hasCreator" and s_ in replies_to_artist:
            by_creator2[o_] = by_creator2.get(o_, 0) + 1
    prev = None
    for row in resp["q"]:
        u = next(uu for (uu, pr), vv in sc.items()
                 if pr == "id" and vv[0] == str(row["id"])
                 and (uu, "firstName") in sc)
        n_ = by_creator2.get(u, 0)
        assert n_ == row["replyCount"], \
            f"q18 replyCount for {row['id']}: {n_} != {row['replyCount']}"
        score = (n_, -int(u, 16))
        assert prev is None or score <= prev, "q18 replyCount not sorted"
        prev = score
    return b.lines


# ===================================================================
# IC11 (q17): friends+FoF of p1 working at Sri_Lanka organisations,
# orderasc id, workAt facet workFrom rendered as the STRING it was
# loaded as (pinned "workAt|workFrom": "2006"), le() on it comparing
# lexicographically against the datetime literal.
# ===================================================================
def fx_q17(resp: dict) -> list[str]:
    b = FixtureBuilder()
    root = b.person(key="root", id=PERSON_ROOT)
    country = b.node(("place", "Sri_Lanka"), "place")
    b.value(country, "name", "Sri_Lanka")
    # workAt lists render in uid order; the pinned order encodes the
    # reference's internal allocation (NOT the LDBC id order — row 6 has
    # org 1230 before 1228). Topo-sort the per-row orders and allocate
    # org uids in that sequence.
    before: dict[int, set[int]] = {}
    orgs: dict[int, dict] = {}
    for row in resp["q"]:
        ids = [org["id"] for org in row["workAt"]]
        for org in row["workAt"]:
            orgs[org["id"]] = org
        for i, a in enumerate(ids):
            before.setdefault(a, set()).update(ids[i + 1:])
    remaining = dict(orgs)
    while remaining:
        nxt = min(o for o in remaining
                  if not any(o in before.get(p, ()) for p in remaining if p != o))
        b.node(("org", nxt), "organisation",
               id=nxt, name=orgs[nxt]["name"])
        del remaining[nxt]
    for row in resp["q"]:
        person = b.person(row)
        b.edge(root, "knows", person)
        for org in row["workAt"]:
            o = b.node(("org", org["id"]), "organisation",
                       id=org["id"], name=org["name"])
            b.edge(o, "isLocatedIn", country)
            b.edge(person, "workAt", o,
                   facets={"workFrom": f'"{org["workAt|workFrom"]}"'})
    # self-check: per-person workAt orgs (uid order) with their
    # workFrom facets and Sri_Lanka location match the pinned rows,
    # and the pinned rows run in ascending person id
    sc, ed = _parse_fx(b.lines)
    located = {s_ for s_, p_, o_, _f in ed
               if p_ == "isLocatedIn" and o_ == country}
    works: dict = {}
    for s_, p_, o_, f_ in ed:
        if p_ == "workAt":
            works.setdefault(s_, []).append((o_, f_))
    prev_id = None
    for row in resp["q"]:
        u = next(uu for (uu, pr), vv in sc.items()
                 if pr == "id" and vv[0] == str(row["id"])
                 and (uu, "firstName") in sc)
        mine = sorted(works.get(u, []), key=lambda t: int(t[0], 16))
        got = [(_val(sc, o_, "id"), f_["workFrom"].strip('\\"'))
               for o_, f_ in mine]
        want = [(str(org["id"]), str(org["workAt|workFrom"]))
                for org in row["workAt"]]
        assert all(o_ in located for o_, _x in mine), "q17 org location"
        assert got == want, f"q17 workAt for {row['id']}: {got} != {want}"
        assert prev_id is None or int(row["id"]) >= prev_id, \
            "q17 ids not ascending"
        prev_id = int(row["id"])
    return b.lines


# ===================================================================
# IC01 (q8): people named Deepak within 3 knows-hops of p1 along all
# 14 direction patterns (f11..f38), each pattern's membership rendered
# as val(distNN). For every pinned row a fresh intermediate chain per
# distance key realises exactly that pattern; _q8_selfcheck then
# recomputes all 14 sets naively (pure-dict BFS, independent of the
# engine) and asserts the synthesized graph reproduces the pinned
# membership sets — guarding against cross-path interactions.
# ===================================================================

# per-pattern chain spec: list of hop directions from root to target,
# True = forward (src knows dst), False = reverse (dst knows src)
_Q8_CHAINS = {
    11: [True],          12: [False],
    21: [True, True],    22: [True, False],
    23: [False, True],   24: [False, False],
    31: [True, True, True],   32: [True, True, False],
    33: [True, False, True],  34: [True, False, False],
    35: [False, True, True],  36: [False, True, False],
    37: [False, False, True], 38: [False, False, False],
}


def _q8_dists(row: dict) -> set[int]:
    return {int(k[len("distance"):]) for k in row if k.startswith("distance")}


def _q8_selfcheck(lines: list[str], root: str, want: dict[str, set[int]]) -> None:
    """Naive recomputation of f11..f38 from the raw triples."""
    fwd: dict[str, set[str]] = {}
    rev: dict[str, set[str]] = {}
    for ln in lines:
        parts = ln.split()
        if parts[1] == "<knows>":
            s, o = parts[0][1:-1], parts[2][1:-1]
            fwd.setdefault(s, set()).add(o)
            rev.setdefault(o, set()).add(s)

    def step(nodes: set[str], forward: bool, exclude_root: bool) -> set[str]:
        out: set[str] = set()
        for n in nodes:
            out |= (fwd if forward else rev).get(n, set())
        if exclude_root:
            out.discard(root)
        return out

    # level-by-level: patterns share prefixes (f31 expands f21's WHOLE
    # node set, all paths), and the reference query filters NOT uid(pid)
    # on every hop except the two first-level blocks f11/f12
    f = {}
    f[11] = step({root}, True, False)
    f[12] = step({root}, False, False)
    f[21] = step(f[11], True, True)
    f[22] = step(f[11], False, True)
    f[23] = step(f[12], True, True)
    f[24] = step(f[12], False, True)
    f[31] = step(f[21], True, True)
    f[32] = step(f[21], False, True)
    f[33] = step(f[22], True, True)
    f[34] = step(f[22], False, True)
    f[35] = step(f[23], True, True)
    f[36] = step(f[23], False, True)
    f[37] = step(f[24], True, True)
    f[38] = step(f[24], False, True)
    for person, dists in want.items():
        got = {nn for nn, members in f.items() if person in members}
        assert got == dists, f"{person}: synthesized {got} != pinned {dists}"


def fx_q8(resp: dict) -> list[str]:
    b = FixtureBuilder()
    root = b.person(key="root", id=PERSON_ROOT)
    want: dict[str, set[int]] = {}
    for row in resp["q"]:
        # the pinned rows don't echo firstName (every hit IS a Deepak —
        # the nid root demands it), so write it explicitly
        person = b.person(row, firstName="Deepak")
        for pred in ("email", "language"):
            for v in row.get(pred, []):
                b.value(person, pred, v)
        for city in row.get("isLocatedIn", []):
            c = b.node(("place", city["name"]), "place")
            b.value(c, "name", city["name"])
            b.edge(person, "isLocatedIn", c)
        for uni in row.get("studyAt", []):
            o = b.node(("org", uni["name"]), "organisation")
            b.value(o, "name", uni["name"])
            for city in uni.get("isLocatedIn", []):
                c = b.node(("place", city["name"]), "place")
                b.value(c, "name", city["name"])
                b.edge(o, "isLocatedIn", c)
            b.edge(person, "studyAt", o)
        dists = _q8_dists(row)
        want[person] = dists
        for nn in sorted(dists):
            chain = _Q8_CHAINS[nn]
            cur = root
            for depth, direction in enumerate(chain):
                nxt = person if depth + 1 == len(chain) else b.node(
                    ("mid", person, nn, depth))
                if direction:
                    b.edge(cur, "knows", nxt)
                else:
                    b.edge(nxt, "knows", cur)
                cur = nxt
    _q8_selfcheck(b.lines, root, want)
    return b.lines
