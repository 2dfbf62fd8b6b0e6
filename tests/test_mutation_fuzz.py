"""Mutation differential fuzz: random set/delete sequences applied by
the ENGINE (mutations.py, posting/list.go Ovr semantics) and by an
independent pure-python dict model, full-state compared after every
document. Covers scalar overwrite (per subject+lang), list union with
exact-edge replacement, specific deletes, `* ` wildcards, and the
`"*"@lang` single-posting wipe — the §2.10 family that previously had
roundtrip tests only."""

import random

import pytest
from pyspark.sql import functions as F

from dgraph_spark.model import OBJECT, SUBJECT, VALUE
from dgraph_spark.mutations import mutate
from dgraph_spark.schema import SchemaRegistry
from dgraph_spark.sources.rdf import graph_from_triples, parse_nquads

SCHEMA = ("name: string @lang .\n"
          "score: int .\n"
          "tag: [string] .\n"
          "friend: [uid] .")

SUBJECTS = list(range(1, 9))
LANGS = [None, "en", "es"]
WORDS = ["ada", "bo", "cy", "dag", "eli"]


def _engine_state(g):
    state = {}
    for pred in ("name", "score", "tag", "friend"):
        rows = []
        if g.has_pred(pred):
            df = g.pred(pred)
            for r in df.collect():
                if OBJECT in df.columns:
                    rows.append((r[SUBJECT], r[OBJECT], None))
                else:
                    lang = r["lang"] if "lang" in df.columns else None
                    rows.append((r[SUBJECT], str(r[VALUE]), lang))
        state[pred] = sorted(rows)
    return state


class Model:
    def __init__(self):
        self.scalar = {"name": {}, "score": {}}   # pred -> (s, lang) -> v
        self.lst = {"tag": {}, "friend": {}}      # pred -> s -> set(v)

    def set(self, pred, s, v, lang=None):
        if pred in self.scalar:
            self.scalar[pred][(s, lang)] = v
        else:
            self.lst[pred].setdefault(s, set()).add(v)

    def delete(self, pred, s, v=None, lang=None):
        if pred in self.scalar:
            d = self.scalar[pred]
            if v == "*" and lang is not None:
                d.pop((s, lang), None)          # "*"@lang: one posting
            elif v is None or v == "*":
                for k in [k for k in d if k[0] == s]:
                    d.pop(k)                    # untagged *: all postings
            # specific scalar deletes are not generated (the reference
            # requires the exact stored value; * is the idiom)
        else:
            d = self.lst[pred]
            if v is None or v == "*":
                d.pop(s, None)
            elif s in d:
                d[s].discard(v)

    def state(self):
        out = {}
        for pred, d in self.scalar.items():
            out[pred] = sorted((s, str(v), lang) for (s, lang), v in d.items())
        for pred, d in self.lst.items():
            out[pred] = sorted((s, v, None) for s, vs in d.items() for v in vs)
        return out


def _gen_doc(rng, model):
    sets, dels = [], []
    for _ in range(rng.randint(1, 5)):
        s = rng.choice(SUBJECTS)
        kind = rng.randrange(6)
        if kind == 0:
            lang = rng.choice(LANGS)
            v = rng.choice(WORDS)
            tag = f"@{lang}" if lang else ""
            sets.append(f'<0x{s:x}> <name> "{v}"{tag} .')
            model.set("name", s, v, lang)
        elif kind == 1:
            v = rng.randint(0, 9)
            sets.append(f"<0x{s:x}> <score> \"{v}\" .")
            model.set("score", s, v)
        elif kind == 2:
            v = rng.choice(WORDS)
            sets.append(f'<0x{s:x}> <tag> "{v}" .')
            model.set("tag", s, v)
        else:
            o = rng.choice(SUBJECTS)
            sets.append(f"<0x{s:x}> <friend> <0x{o:x}> .")
            model.set("friend", s, o)
    for _ in range(rng.randint(0, 3)):
        s = rng.choice(SUBJECTS)
        kind = rng.randrange(5)
        if kind == 0:
            dels.append(f"<0x{s:x}> <name> * .")
            model.delete("name", s, "*")
        elif kind == 1:
            lang = rng.choice(["en", "es"])
            dels.append(f'<0x{s:x}> <name> "*"@{lang} .')
            model.delete("name", s, "*", lang)
        elif kind == 2:
            v = rng.choice(WORDS)
            dels.append(f'<0x{s:x}> <tag> "{v}" .')
            model.delete("tag", s, v)
        elif kind == 3:
            o = rng.choice(SUBJECTS)
            dels.append(f"<0x{s:x}> <friend> <0x{o:x}> .")
            model.delete("friend", s, o)
        else:
            p = rng.choice(["tag", "friend", "score"])
            dels.append(f"<0x{s:x}> <{p}> * .")
            model.delete(p, s, "*")
    doc = ""
    if sets:
        doc += "{ set { " + "\n".join(sets) + " } "
    else:
        doc += "{ "
    if dels:
        doc += "delete { " + "\n".join(dels) + " } "
    doc += "}"
    return doc


@pytest.mark.parametrize("seed", [
    31, pytest.param(20260815, marks=pytest.mark.slow),
    pytest.param(77, marks=pytest.mark.slow)])
def test_mutation_differential_fuzz(spark, seed):
    rng = random.Random(seed)
    base = spark.createDataFrame(
        [('<0x1> <name> "seed" .',), ("<0x1> <friend> <0x2> .",)],
        "value string")
    g = graph_from_triples(spark, parse_nquads(base),
                           SchemaRegistry.parse(SCHEMA))
    model = Model()
    model.set("name", 1, "seed", None)
    model.set("friend", 1, 2)
    for i in range(6):
        doc = _gen_doc(rng, model)
        g = mutate(g, doc)
        got, want = _engine_state(g), model.state()
        assert got == want, (i, doc, got, want)
