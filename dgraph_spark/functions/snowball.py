"""Snowball stemmers for da/no/sv/ru — the algorithms behind the
reference's fulltext analyzers for those languages (tok/stemmers.go
langStemmers routes da -> stemmer_da_snowball, no -> stemmer_no_snowball,
sv -> stemmer_sv_snowball, ru -> stemmer_ru_snowball; bleve wraps the
published Snowball algorithms from snowballstem.org).

Each language is ONE declarative spec (vowels + region defs + a step
program) interpreted by three backends that agree by construction
(tests/test_snowball.py cross-checks them on real vocabulary):

- a Python function (query-literal stemming),
- a Spark Column transform (JVM-side inside F.transform),
- a DuckDB SQL expression chain (the CORRECTNESS oracle twin).

Program primitives (mirroring the Snowball source structure):

  ("among", region, [(suffix, checks, action[, followup]), ...])
      longest-SUFFIX-first matching LIMITED to the region (a suffix
      reaching before the region start does not match — Snowball's
      `setlimit tomark p1 among(...)`); the first matching rule's
      checks then gate its action; a failed check fails the WHOLE
      among with no fall-through (Snowball among semantics). An
      optional 4th rule element is a follow-up program run on the
      result ONLY when this rule fired (Dutch `'end' (delete ... or
      undouble)` clauses).
  ("among", region, rules, "check")
      region-as-CONDITION variant (`[substring] R1 among(...)`): the
      longest suffix matches UNLIMITED; the region test then gates
      the action like a check — a suffix crossing the region start
      FAILS the whole among instead of falling through to a shorter
      entry (Dutch/Romanian style, vs the Nordic setlimit style).
  ("or", [prog, ...])     alternatives until one CHANGES the token
                          (every action deletes or rewrites, so
                          changed == succeeded)
  ("seq", [prog, ...])    run all in order, each with `try` semantics
  ("ifchanged", A, B)     run A; only when A changed the token, also
                          try B (Snowball `X (try Y)` / "and then
                          repeat step 2" clauses)
  ("undouble", region[, chars])
                          drop the last letter of a final double
                          consonant whose last char lies in region
                          (region None = whole word); with chars,
                          only those letters undouble (Dutch kk/dd/tt)

  region: "r1" | "rv" | "r2" | None
  checks: ((idx_from_end, chars), ...) — token[-idx] must be in chars;
          a leading "!" negates (an out-of-range index PASSES a negated
          check, fails a positive one). An element may instead be
          ("or", group, group, ...) where each group is a tuple of
          (idx, chars) checks ANDed together — the element passes when
          ANY group passes (Snowball's disjunctive valid-s-ending).
  action: ("del",) or ("repl", "replacement") — replaces the suffix;
          ("del_u",) — delete then undouble a final kk/dd/tt (Dutch
          en/e endings); ("noop",) — the rule MATCHES (blocking
          fall-through) but changes nothing (a Snowball rule whose
          condition is known false, e.g. Dutch `bar` with no e_found).

Languages whose step program needs cross-step state (Dutch e_found)
define "stages" instead of "prog": a stage plan interpreted by all
THREE backends. Stage kinds shared with the expression backends below,
plus ("tr", src, dst) char translation, ("re", [(pat, "$1x"), ...])
sequential regex replaces, ("flag_if_changed", prog) setting the '#'
flag, ("branch_flag", progA, progB) choosing by flag, ("strip_flag",).

A spec may set "checks_in_region": True (Russian): the whole step
program runs inside `setlimit tomark pV`, so a check character lying
BEFORE the region start behaves as out-of-range (fails a positive
check, passes a negated one). da/no/sv checks stay unlimited — their
setlimit covers only the among's substring match, the rule bodies
(valid-s-ending tests) run on the full word.

Regions recompute per step from the current token: every action only
touches text at/after the region start, so the prefix that determines
the region is stable (the same invariant Snowball exploits by keeping
integer cursors).

The Spark/DuckDB backends compile each language to a LIST OF STAGES
(one F.transform / list_transform per stage) exactly like the light
stemmers; Russian's step-1 alternation ("perfective-gerund OR
[reflexive; adjectival OR verb OR noun]") is staged with the same
string-marker technique so each big among appears ONCE in the generated
expression instead of being substituted into its successors.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

MARK = "!"   # or-chain satisfied: later alternatives skip
AUX = "@"    # transient: adjective fired, participle may follow
FLAG = "#"   # cross-step boolean (Dutch e_found); tokens are split on
             # non-letter/digit/mark so none of these occur in data
KIFLAG = "+"  # Turkish: one more ki-chain round pending (see
              # _tr_ki_level); consumed by the if_kiflag stages
SEP = "^"     # Turkish held suffix (ndA/nA branch): the matched head
              # is stashed BEFORE the stem as "head^stem" so the inner
              # ki-chain keeps operating on the string tail; the
              # "stash" region bounds every check to the stem part;
              # the unstash stage reassembles stem+head at the end

# --------------------------------------------------------------- specs

_DEL = ("del",)


def _r(suffix, *checks, repl=None, action=None, follow=None):
    act = action or (_DEL if repl is None else ("repl", repl))
    rule = (suffix, tuple(checks), act)
    return rule + (follow,) if follow is not None else rule


_SCAND_VOWELS = "aeiouyæåø"
_SV_VOWELS = "aeiouyäåö"

_DA_STEP2 = ("among", "r1", [
    _r("gd", repl="g"), _r("dt", repl="d"),
    _r("gt", repl="g"), _r("kt", repl="k"),
])

# Danish (snowballstem.org/algorithms/danish/stemmer.html)
DA_SPEC = {
    "vowels": _SCAND_VOWELS,
    "min_r1": 3,
    "prog": ("seq", [
        ("among", "r1", [
            _r("erendes"), _r("erende"), _r("hedens"), _r("endes"),
            _r("erede"), _r("erens"), _r("erets"), _r("ernes"),
            _r("heden"), _r("heder"), _r("ethed"), _r("ende"),
            _r("enes"), _r("ered"), _r("eren"), _r("erer"), _r("eres"),
            _r("eret"), _r("heds"), _r("ene"), _r("ens"), _r("ere"),
            _r("erne"), _r("ers"), _r("ets"), _r("hed"), _r("en"),
            _r("er"), _r("es"), _r("et"), _r("e"),
            _r("s", (2, "abcdfghjklmnoprtvyzå")),
        ]),
        _DA_STEP2,
        ("among", None, [_r("igst", repl="ig")]),
        ("or", [
            # "delete, and then repeat step 2" — step 2 reruns ONLY
            # when the ig-group deleted (a word like *gdt must not
            # lose two letters)
            ("ifchanged",
             ("among", "r1", [_r("elig"), _r("lig"), _r("els"), _r("ig")]),
             _DA_STEP2),
            ("among", "r1", [_r("løst", repl="løs")]),
        ]),
        ("undouble", "r1"),
    ]),
}

# Norwegian (snowballstem.org/algorithms/norwegian/stemmer.html)
NO_SPEC = {
    "vowels": _SCAND_VOWELS,
    "min_r1": 3,
    "prog": ("seq", [
        ("among", "r1", [
            _r("hetenes"), _r("hetene"), _r("hetens"), _r("heten"),
            _r("heter"), _r("endes"), _r("ande"), _r("ende"), _r("edes"),
            _r("enes"), _r("erte", repl="er"), _r("ane"), _r("ene"),
            _r("ens"), _r("ers"), _r("ets"), _r("het"), _r("ast"),
            _r("ert", repl="er"), _r("ede"), _r("en"), _r("ar"),
            _r("er"), _r("as"), _r("es"), _r("et"), _r("a"), _r("e"),
            # ONE disjunctive rule — Snowball's valid-s-ending is
            # "b..z OR (k not preceded by a vowel)"; two separate 's'
            # rules would never reach the second (longest-first pick,
            # failed checks fail the whole among, no fall-through)
            _r("s", ("or",
                     ((2, "bcdfghjlmnoprtvyz"),),
                     ((2, "k"), (3, "!" + _SCAND_VOWELS)))),
        ]),
        ("among", "r1", [_r("dt", repl="d"), _r("vt", repl="v")]),
        ("among", "r1", [
            _r("hetslov"), _r("eleg"), _r("elig"), _r("elov"),
            _r("slov"), _r("leg"), _r("eig"), _r("lig"), _r("els"),
            _r("lov"), _r("ig"),
        ]),
    ]),
}

# Swedish (snowballstem.org/algorithms/swedish/stemmer.html)
SV_SPEC = {
    "vowels": _SV_VOWELS,
    "min_r1": 3,
    "prog": ("seq", [
        ("among", "r1", [
            _r("heterna"), _r("hetens"), _r("anden"), _r("heten"),
            _r("heter"), _r("arnas"), _r("ernas"), _r("ornas"),
            _r("andes"), _r("arens"), _r("andet"), _r("arna"),
            _r("erna"), _r("orna"), _r("ande"), _r("arne"), _r("aste"),
            _r("aren"), _r("ades"), _r("erns"), _r("ade"), _r("are"),
            _r("ern"), _r("ens"), _r("het"), _r("ast"), _r("ad"),
            _r("en"), _r("ar"), _r("er"), _r("or"), _r("as"), _r("es"),
            _r("at"), _r("a"), _r("e"),
            _r("s", (2, "bcdfghjklmnoprtvy")),
        ]),
        ("among", "r1", [
            _r("dd", repl="d"), _r("gd", repl="g"), _r("nn", repl="n"),
            _r("dt", repl="d"), _r("gt", repl="g"), _r("kt", repl="k"),
            _r("tt", repl="t"),
        ]),
        ("among", "r1", [
            _r("fullt", repl="full"), _r("löst", repl="lös"),
            _r("lig"), _r("els"), _r("ig"),
        ]),
    ]),
}

# Dutch (snowballstem.org/algorithms/dutch/stemmer.html) — classic
# algorithm, the one behind bleve's stemmer_nl_snowball. Needs
# cross-step state (e_found gates the 3b `bar` rule) and the Y/I
# vowel-marking prelude, so it is a stage plan shared by the three
# backends. Regions recompute per step as usual: every action touches
# only text at/after R1 (which starts at position >= 4).
_NL_V = "aeiouyè"

_NL_UNDOUBLE = ("undouble", None, "kdt")   # "ends kk, dd or tt"


def _nl_en_rule(suffix):
    """en/ene: delete if in R1 and preceded by a valid en-ending (a
    non-vowel, and not the string gem), then undouble the ending."""
    n = len(suffix)
    return _r(suffix,
              (n + 1, "!" + _NL_V),
              ("or", ((n + 1, "!m"),), ((n + 2, "!e"),), ((n + 3, "!g"),)),
              action=("del_u",))


_NL_STEP1 = ("among", "r1", [
    _r("heden", repl="heid"),
    _nl_en_rule("en"), _nl_en_rule("ene"),
    _r("s", (2, "!" + _NL_V + "j")),
    _r("se", (3, "!" + _NL_V + "j")),
], "check")

# step 2: delete final e if in R1 and preceded by a non-vowel, then
# undouble; firing sets e_found (the flag stage below)
_NL_STEP2 = ("among", "r1", [
    _r("e", (2, "!" + _NL_V), action=("del_u",)),
], "check")

_NL_STEP3A = ("among", "r2", [
    _r("heid", (5, "!c"),
       follow=("among", "r1", [_nl_en_rule("en")], "check")),
], "check")

_NL_IG = ("among", "r2", [_r("ig", (3, "!e"))], "check")
_NL_ENDING_FOLLOW = ("or", [_NL_IG, _NL_UNDOUBLE])


def _nl_step3b(e_found: bool):
    # one among so longest-match-then-fail applies across baar/bar etc;
    # without e_found the matched `bar` rule blocks fall-through but
    # changes nothing (Snowball: rule condition false -> among fails)
    return ("among", "r2", [
        _r("end", follow=_NL_ENDING_FOLLOW),
        _r("ing", follow=_NL_ENDING_FOLLOW),
        _r("ig", (3, "!e")),
        _r("lijk", follow=_NL_STEP2),
        _r("baar"),
        _r("bar") if e_found else _r("bar", action=("noop",)),
    ], "check")


NL_SPEC = {
    "vowels": _NL_V,
    "min_r1": 3,
    # the Dutch source clamps with a raw cursor constant
    # (`try($p1 < 3 $p1 = 3)`), and Snowball runtimes (C in postgres,
    # Go in bleve) use BYTE cursors — so the 3 counts bytes, unlike
    # Danish's char-aware `test hop 3 setmark x`. Verified against the
    # postgres snowball oracle: èse -> ès (natural p1 = 3 bytes, no
    # clamp) but ase -> ase (p1 = 2, clamped).
    "units": "bytes",
    "uses_flag": True,
    "stages": [
        # prelude: drop umlauts/acutes; mark initial y, then ONE exact
        # left-to-right scan marking y after a vowel and i between
        # vowels (a character fold in all three backends: the
        # PROCESSED previous char governs, so overlapping chains mark
        # exactly like the reference's single pass)
        ("tr", "äëïöüáéíóú", "aeiouaeiou"),
        ("re", [("^y", "Y")]),
        ("mark_scan", (("y", False), ("i", True))),
        ("plain", _NL_STEP1),
        ("flag_if_changed", _NL_STEP2),
        ("plain", _NL_STEP3A),
        ("branch_flag", _nl_step3b(True), _nl_step3b(False)),
        ("strip_flag",),
        # step 4, undouble vowel: word ends CVD (C non-vowel, V in
        # {aa,ee,oo,uu}, D non-vowel other than I) -> drop one vowel
        ("re", [(f"([^{_NL_V}]){v}{v}([^{_NL_V}I])$", f"$1{v}$2")
                for v in "aeou"]),
        ("tr", "YI", "yi"),   # postlude
    ],
}

# Romanian (snowballstem.org/algorithms/romanian/stemmer.html) — the
# classic algorithm with CEDILLA forms only (ş U+015F, ţ U+0163):
# snowball 2.x, i.e. what postgres ships and what bleve's Go port
# implements, does not fold the comma-below spellings (verified:
# ts_lexize ro 'vorbeşti' -> vorb but 'vorbești' -> vorbeșt). The
# verb-suffix entry set and its two action groups were RECOVERED
# EMPIRICALLY against the postgres snowball oracle (classifier probes
# with the preceded-by test character inside/outside RV), then
# fuzz-validated; see tests/golden/snowball_vectors.json.
_RO_S = "ş"   # ş
_RO_T = "ţ"   # ţ
_RO_V = "aăâeiîou"   # a ă â e i î o u
_RO_A = "ă"   # ă
_RO_AC = "â"  # â

_RO_STEP0 = ("among", "r1", [
    _r("ul"), _r("ului"),
    _r("aua", repl="a"),
    _r("ea", repl="e"), _r("ele", repl="e"), _r("elor", repl="e"),
    _r("ii", repl="i"), _r("iua", repl="i"), _r("iei", repl="i"),
    _r("iile", repl="i"), _r("iilor", repl="i"), _r("ilor", repl="i"),
    # ile -> i unless preceded by the string ab
    _r("ile", ("or", ((4, "!b"),), ((5, "!a"),)), repl="i"),
    _r("atei", repl="at"),
    _r(f"a{_RO_T}ie", repl=f"a{_RO_T}i"),
    _r(f"a{_RO_T}ia", repl=f"a{_RO_T}i"),
], "check")

_RO_STEP1 = ("among", "r1", [
    _r("abilitate", repl="abil"), _r("abilitati", repl="abil"),
    _r(f"abilit{_RO_A}i", repl="abil"),
    _r(f"abilit{_RO_A}{_RO_T}i", repl="abil"),
    _r("ibilitate", repl="ibil"),
    _r("ivitate", repl="iv"), _r("ivitati", repl="iv"),
    _r(f"ivit{_RO_A}i", repl="iv"),
    _r(f"ivit{_RO_A}{_RO_T}i", repl="iv"),
    _r("icitate", repl="ic"), _r("icitati", repl="ic"),
    _r(f"icit{_RO_A}i", repl="ic"),
    _r(f"icit{_RO_A}{_RO_T}i", repl="ic"),
    _r("icator", repl="ic"), _r("icatori", repl="ic"),
    _r("iciv", repl="ic"), _r("iciva", repl="ic"),
    _r("icive", repl="ic"), _r("icivi", repl="ic"),
    _r(f"iciv{_RO_A}", repl="ic"),
    _r("ical", repl="ic"), _r("icala", repl="ic"),
    _r("icale", repl="ic"), _r("icali", repl="ic"),
    _r(f"ical{_RO_A}", repl="ic"),
    _r("ativ", repl="at"), _r("ativa", repl="at"),
    _r("ative", repl="at"), _r("ativi", repl="at"),
    _r(f"ativ{_RO_A}", repl="at"),
    _r(f"a{_RO_T}iune", repl="at"),
    _r("atoare", repl="at"), _r("ator", repl="at"),
    _r("atori", repl="at"),
    _r(f"{_RO_A}toare", repl="at"), _r(f"{_RO_A}tor", repl="at"),
    _r(f"{_RO_A}tori", repl="at"),
    _r("itiv", repl="it"), _r("itiva", repl="it"),
    _r("itive", repl="it"), _r("itivi", repl="it"),
    _r(f"itiv{_RO_A}", repl="it"),
    _r(f"i{_RO_T}iune", repl="it"),
    _r("itoare", repl="it"), _r("itor", repl="it"),
    _r("itori", repl="it"),
], "check")

_RO_STEP2 = ("among", "r2", [
    *[_r(s) for s in (
        "at ata ati ate ut uta uti ute it ita iti ite "
        "ic ica ice ici abil abila abile abili "
        "ibil ibila ibile ibili oasa oase os osi "
        "ant anta ante anti ator atori itate itati "
        "iv iva ive ivi").split()],
    *[_r(s + _RO_A) for s in
      ("at", "ut", "it", "ic", "abil", "ibil", "ant", "iv")],
    _r(f"oas{_RO_A}"), _r(f"o{_RO_S}i"),
    _r(f"ant{_RO_A}"), _r(f"it{_RO_A}i"), _r(f"it{_RO_A}{_RO_T}i"),
    _r(f"iv{_RO_A}"),
    # iune/iuni delete when preceded by ţ, which becomes t
    _r("iune", (5, _RO_T), action=("repl_ext", 1, "t")),
    _r("iuni", (5, _RO_T), action=("repl_ext", 1, "t")),
    _r("ism", repl="ist"), _r("isme", repl="ist"),
    _r("ist", repl="ist"), _r("ista", repl="ist"),
    _r("iste", repl="ist"), _r("isti", repl="ist"),
    _r(f"ist{_RO_A}", repl="ist"), _r(f"i{_RO_S}ti", repl="ist"),
], "check")

# verb suffixes (recovered entry set): group (a) deletes only when
# preceded WITHIN RV by a consonant or u; group (b) always deletes
_RO_VERB_A = (
    f"are ere ire {_RO_AC}re ind {_RO_AC}nd indu {_RO_AC}ndu "
    f"eze eaz{_RO_A} ez ezi easc{_RO_A} esc e{_RO_S}ti e{_RO_S}te "
    f"{_RO_A}sc {_RO_A}{_RO_S}ti {_RO_A}{_RO_S}te "
    f"am ai au eam eai eau iam iai iau "
    f"ea{_RO_T}i ia{_RO_T}i "
    f"a{_RO_S}i ar{_RO_A}m ar{_RO_A}{_RO_T}i ar{_RO_A} "
    f"{_RO_AC}i {_RO_AC}{_RO_S}i "
    f"{_RO_AC}r{_RO_A} {_RO_AC}r{_RO_A}m {_RO_AC}r{_RO_A}{_RO_T}i "
    f"ir{_RO_A} ir{_RO_A}m ir{_RO_A}{_RO_T}i i{_RO_S}i "
    f"ur{_RO_A} ur{_RO_A}m ur{_RO_A}{_RO_T}i u{_RO_S}i ui "
    f"ia ase asem aser{_RO_A} aser{_RO_A}m aser{_RO_A}{_RO_T}i "
    f"ase{_RO_S}i ise isem iser{_RO_A} iser{_RO_A}m "
    f"iser{_RO_A}{_RO_T}i ise{_RO_S}i "
    f"use usem user{_RO_A} user{_RO_A}m user{_RO_A}{_RO_T}i "
    f"use{_RO_S}i "
    f"{_RO_AC}se {_RO_AC}sem {_RO_AC}ser{_RO_A} {_RO_AC}ser{_RO_A}m "
    f"{_RO_AC}ser{_RO_A}{_RO_T}i {_RO_AC}se{_RO_S}i"
).split()
_RO_VERB_B = (
    f"em e{_RO_T}i im i{_RO_T}i {_RO_AC}m {_RO_AC}{_RO_T}i {_RO_A}m "
    f"a{_RO_T}i "
    f"se sei se{_RO_S}i ser{_RO_A} ser{_RO_A}m ser{_RO_A}{_RO_T}i "
    f"sese sesem sese{_RO_S}i seser{_RO_A} seser{_RO_A}m "
    f"seser{_RO_A}{_RO_T}i"
).split()

_RO_STEP3 = ("among", "rv", [
    *[_r(s, (len(s) + 1, "!aeio" + _RO_A + _RO_AC + "î"))
      for s in _RO_VERB_A],
    *[_r(s) for s in _RO_VERB_B],
], "limit_cb")

_RO_STEP4 = ("among", "rv", [
    _r("a"), _r("e"), _r("i"), _r("ie"), _r(_RO_A),
], "check")

RO_SPEC = {
    "vowels": _RO_V,
    "min_r1": 0,
    "rv_style": "es",
    "uses_flag": True,
    "stages": [
        # prelude: ONE exact left-to-right scan marking i and u
        # between vowels as consonants (I/U)
        ("mark_scan", (("i", True), ("u", True))),
        ("plain", _RO_STEP0),
        # step 1 repeats until no replacement; five passes reach the
        # fixpoint (every firing shortens the token by >= 2). Steps 1
        # and 2 set the standard-suffix-removed flag; the verb step
        # runs only when NEITHER fired (step 0 does not gate it —
        # verified: aţia -> step 0 -> verb aţi still strips).
        ("flag_if_changed", _RO_STEP1), ("flag_if_changed", _RO_STEP1),
        ("flag_if_changed", _RO_STEP1), ("flag_if_changed", _RO_STEP1),
        ("flag_if_changed", _RO_STEP1),
        ("flag_if_changed", _RO_STEP2),
        ("branch_flag", ("seq", []), _RO_STEP3),
        ("plain", _RO_STEP4),
        ("strip_flag",),
        ("tr", "IU", "iu"),   # postlude
    ],
}

# Finnish (snowballstem.org/algorithms/finnish/stemmer.html) — every
# step runs inside setlimit (R1 or R2), so ALL checks are bounded
# (checks_in_region). Step 3 sets a flag consumed by step 5's branch.
# Details pinned against the postgres snowball oracle and
# fuzz-validated; see tests/golden/snowball_vectors.json.
_FI_V = "aeiouyäö"
_FI_LV = ["aa", "ee", "ii", "oo", "uu", "ää", "öö"]


def _fi_pair(n, pair):
    """check group: the two chars immediately before an n-char suffix
    equal `pair` (e.g. preceded by 'ta' / long vowel / Vi)."""
    return ((n + 2, pair[0]), (n + 1, pair[1]))


_FI_V1 = "aeiouäö"   # the Vi / plural-context vowels exclude y

_FI_STEP1 = ("or", [
    ("among", "r1", [
        _r(s, (len(s) + 1, "nt" + _FI_V))
        for s in ["kin", "kaan", "kään", "ko", "kö", "han", "hän",
                  "pa", "pä"]
    ]),
    ("among", "r2", [_r("sti")]),
])

# possessives; the an/än/en context forms re-emit their case-ending
# context (taan -> ta), which step 3 then removes — pinned by probes
# (tolitaan -> tol requires the step-3 flag to be set on the way)
_FI_STEP2 = ("among", "r1", [
    _r("si", (3, "!k")),
    _r("ni", follow=("among", "r1", [_r("kse", repl="ksi")])),
    _r("nsa"), _r("nsä"), _r("mme"), _r("nne"),
    _r("taan", repl="ta"), _r("ssaan", repl="ssa"),
    _r("staan", repl="sta"), _r("llaan", repl="lla"),
    _r("ltaan", repl="lta"), _r("naan", repl="na"),
    _r("tään", repl="tä"), _r("ssään", repl="ssä"),
    _r("stään", repl="stä"), _r("llään", repl="llä"),
    _r("ltään", repl="ltä"), _r("nään", repl="nä"),
    _r("lleen", repl="lle"), _r("ineen", repl="ine"),
])

_FI_N_FOLLOW = ("among", "r1", [
    *[_r(p, repl=p[0]) for p in _FI_LV],
    _r("ie", repl="i"),
])

# case endings, in two amongs because only the DELETE rules set the
# ending_removed flag consumed by step 5 (oracle: toliiden -> toli,
# the re-emitted i survives; taloihin -> talo, the hin-deletion's
# trailing i is removed by step 5). The Vi/LV families are CONTEXT
# entries re-emitting the vowel (toloiden -> tolo; tolyiden falls
# through to n since y is not V1); hXn carries a blocking test
# (tolhin stays tolhin: the failed test fails the whole among, so the
# bare n rule is unreachable).
_FI_STEP3_CTX = ("among", "r1", [
    *[_r(x + "iden", repl=x) for x in _FI_V1],
    *[_r(x + "itten", repl=x) for x in _FI_V1],
    *[_r(x + "isiin", repl=x) for x in _FI_V1],
    *[_r(p + "seen", repl=p) for p in _FI_LV],
])

_FI_STEP3 = ("among", "r1", [
    # only the six a/e/i/o/ä/ö illative forms — hun/hyn are not in the
    # algorithm (oracle: atuhun -> atuhu, the bare n rule fires)
    *[_r("h" + x + "n", (4, x)) for x in "aeioäö"],
    _r("a", (2, _FI_V), (3, "!" + _FI_V)),
    _r("ä", (2, _FI_V), (3, "!" + _FI_V)),
    # tta/ttä carry a blocking test like hXn (tontta: the failed e-test
    # blocks ta, the a goes via step 6b instead)
    _r("tta", (4, "e")), _r("ttä", (4, "e")),
    _r("ta"), _r("tä"), _r("ssa"), _r("ssä"), _r("sta"), _r("stä"),
    _r("lla"), _r("llä"), _r("lta"), _r("ltä"), _r("lle"),
    _r("na"), _r("nä"), _r("ksi"), _r("ine"),
    _r("n", follow=_FI_N_FOLLOW),
])

_FI_NOT_PO = ("or", ((4, "!o"),), ((5, "!p"),))
_FI_STEP4 = ("among", "r2", [
    _r("mpi", _FI_NOT_PO), _r("mpa", _FI_NOT_PO), _r("mpä", _FI_NOT_PO),
    _r("mmi", _FI_NOT_PO), _r("mma", _FI_NOT_PO), _r("mmä", _FI_NOT_PO),
    _r("impi"), _r("impa"), _r("impä"),
    _r("immi"), _r("imma"), _r("immä"),
    _r("eja"), _r("ejä"),
])

_FI_STEP5_IJ = ("among", "r1", [_r("i"), _r("j")])
_FI_STEP5_T = ("among", "r1", [
    _r("t", (2, _FI_V),
       follow=("among", "r2", [
           _r("imma"),
           _r("mma", _FI_NOT_PO),
       ])),
])

# step 6 tidy substeps a-d — kept as SEPARATE stages below: a seq
# would nest each among's expression inside the next in the Spark /
# DuckDB backends (multi-MB generated SQL)
_FI_STEP6A = ("among", "r1", [_r(p, repl=p[0]) for p in _FI_LV])
# b) R1 ends cX (c consonant, X in a ä e i): delete the last letter —
# the consonant must itself lie in R1 (tolat keeps its a)
_FI_STEP6B = ("among", "r1", [_r(x, (2, "!" + _FI_V)) for x in "aäei"],
              "limit_cb")
_FI_STEP6C = ("among", "r1", [_r("j", (2, "ou"))], "limit_cb")
_FI_STEP6D = ("among", "r1", [_r("o", (2, "j"))], "limit_cb")

# e) final double consonant followed by zero or more vowels: drop one
# (unbounded: akk -> ak even with R1 = "k")
_FI_UNDOUBLE = ("undouble_vtail", None)

FI_SPEC = {
    "vowels": _FI_V,
    "min_r1": 0,
    "uses_flag": True,
    "stages": [
        ("plain", _FI_STEP1),
        ("plain", _FI_STEP2),
        # ONE among in the source: when a context entry fires, the
        # delete rules must not fire again on the re-emitted vowel
        # (öjmoaitten -> öjmoa, the cv rule may not eat the a); only
        # the delete branch sets the ending_removed flag
        ("or_flag_second", _FI_STEP3_CTX, _FI_STEP3),
        ("plain", _FI_STEP4),
        ("branch_flag", _FI_STEP5_IJ, _FI_STEP5_T),
        ("plain", _FI_STEP6A), ("plain", _FI_STEP6B),
        ("plain", _FI_STEP6C), ("plain", _FI_STEP6D),
        ("strip_flag",),
        ("plain", _FI_UNDOUBLE),
    ],
}

# Hungarian (snowballstem.org/algorithms/hungarian/stemmer.html) —
# R1-only, no cross-step state. Digraphs (cs dz dzs gy ly ny sz ty zs)
# count as single consonants for R1 and can form doubled forms (ssz,
# ggy, ...) for the instrumental/factive undoubling. Details pinned
# against the postgres snowball oracle and fuzz-validated.
_HU_V = "aáeéiíoóöőuúüű"
_HU_PLAIN_DBL = "bcdfghjklmnprstvz"
_HU_DIGRAPH_DBL = ["ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs"]


def _hu_dbl_check(n):
    """preceded by a double consonant (plain cc or doubled digraph)"""
    groups = [((n + 1, c), (n + 2, c)) for c in _HU_PLAIN_DBL]
    for d in _HU_DIGRAPH_DBL:
        groups.append(tuple((n + 1 + i, d[-1 - i]) for i in range(3)))
    return ("or", *groups)


_HU_UNDOUBLE = ("among", None, [
    *[_r(d, repl=d[1:]) for d in _HU_DIGRAPH_DBL],
    *[_r(c + c, repl=c) for c in _HU_PLAIN_DBL],
])

_HU_V_ENDING = ("among", "r1", [
    _r("á", repl="a"), _r("é", repl="e"),
], "check")

_HU_CASE = ("among", "r1", [
    *[_r(s) for s in (
        "ban ben ba be ra re nak nek val vel tól től ról ről ból ből "
        "hoz hez höz nál nél ig at et ot öt ért képp képpen kor ul ül "
        "vá vé onként enként anként ként en on an ön n t").split()],
], "check")

# owned / plural-owner / owner / plural: an or-chain — exactly one of
# the four fires per word (oracle: tolbáéé stops after éé; bid -> bi
# via owner d after the blocked plur-owner id; ajaink -> ajai via
# owner nk after the blocked jaink). Each among is check-mode: the
# longest match gates on R1 and blocks its own among on failure.
_HU_OWNER = ("among", "r1", [
    _r("unk"), _r("ünk"), _r("nk"),
    _r("ánk", repl="a"), _r("énk", repl="e"),
    _r("juk"), _r("jük"), _r("uk"), _r("ük"),
    _r("ájuk", repl="a"), _r("éjük", repl="e"),
    _r("em"), _r("om"), _r("am"), _r("m"),
    _r("ám", repl="a"), _r("ém", repl="e"),
    _r("od"), _r("ed"), _r("ad"), _r("öd"), _r("d"),
    _r("ád", repl="a"), _r("éd", repl="e"),
    _r("ja"), _r("je"), _r("a"), _r("e"), _r("o"),
    _r("á", repl="a"), _r("é", repl="e"),
], "check")

# owned: é / éi and the ké-family chain into the owner step (oracle:
# tolberáé -> tolbera via é then á -> a; tolberdoké -> tolber via oké
# then d); éé / ééi / áéi and the j-composites do not (tolbáéé stops
# at tolbá). Residual divergence: a handful of R1-boundary chains in
# this corner (~1% of fuzz words) still differ from the reference —
# see tests/test_snowball.py HU_KNOWN_EDGE.
_HU_OWNED = ("among", "r1", [
    _r("é", follow=_HU_OWNER), _r("éi", follow=_HU_OWNER),
    _r("éé"), _r("ééi"), _r("áéi"), _r("jáké"), _r("jéké"),
    _r("aké", follow=_HU_OWNER), _r("eké", follow=_HU_OWNER),
    _r("oké", follow=_HU_OWNER), _r("öké", follow=_HU_OWNER),
    _r("áké", follow=_HU_OWNER), _r("éké", follow=_HU_OWNER),
    _r("ké", follow=_HU_OWNER),
], "check")

_HU_PLUR_OWNER = ("among", "r1", [
    _r("jaim"), _r("jeim"), _r("aim"), _r("eim"), _r("im"),
    _r("áim", repl="a"), _r("éim", repl="e"),
    _r("jaid"), _r("jeid"), _r("aid"), _r("eid"), _r("id"),
    _r("áid", repl="a"), _r("éid", repl="e"),
    _r("jai"), _r("jei"), _r("ai"), _r("ei"), _r("i"),
    _r("ái", repl="a"),
    _r("jaink"), _r("jeink"), _r("aink"), _r("eink"), _r("ink"),
    _r("áink", repl="a"), _r("éink", repl="e"),
    _r("jaitok"), _r("jeitek"), _r("aitok"), _r("eitek"), _r("itek"),
    _r("áitok", repl="a"), _r("éitek", repl="e"),
    _r("jaik"), _r("jeik"), _r("aik"), _r("eik"), _r("ik"),
    _r("áik", repl="a"), _r("éik", repl="e"),
    _r("éi", repl="e"),
], "check")

_HU_PLURAL = ("among", "r1", [
    _r("ák", repl="a"), _r("ék", repl="e"),
    _r("ök"), _r("ok"), _r("ek"), _r("ak"), _r("k"),
], "check")

HU_SPEC = {
    "vowels": _HU_V,
    "min_r1": 0,
    "r1_style": "hu",
    "prog": ("seq", [
        # 1. instrumental: al/el after a double consonant, undouble
        ("among", "r1", [
            _r("al", _hu_dbl_check(2), follow=_HU_UNDOUBLE),
            _r("el", _hu_dbl_check(2), follow=_HU_UNDOUBLE),
        ], "check"),
        # 2. frequent cases; a final á/é left IN R1 then normalizes
        # (bán -> bá: the á before R1 stays accented)
        ("ifchanged", _HU_CASE, _HU_V_ENDING),
        # 3. special cases
        ("among", "r1", [_r("án", repl="a"), _r("ánként", repl="a"),
                         _r("én", repl="e")], "check"),
        # 5. factive á/é after a double consonant, undouble
        ("among", "r1", [
            _r("á", _hu_dbl_check(1), follow=_HU_UNDOUBLE),
            _r("é", _hu_dbl_check(1), follow=_HU_UNDOUBLE),
        ], "check"),
        # 6-9. owned OR owner (mutually exclusive: tolbáéé stops after
        # éé), then plural-owner, then plural — each running once and
        # chaining (tolberekam: owner am, then plural ek)
        ("or", [_HU_OWNED, _HU_OWNER]),
        _HU_PLUR_OWNER,
        _HU_PLURAL,
    ]),
}

# Russian (snowballstem.org/algorithms/russian/stemmer.html) — every
# test takes place inside RV; the derivational step additionally
# requires R2.
_RU_V = "аеиоуыэюя"
_AYA = "ая"

_PERFECTIVE_GERUND = ("among", "rv", [
    _r("ившись"), _r("ывшись"),
    _r("вшись", (6, _AYA)),
    _r("ивши"), _r("ывши"),
    _r("вши", (4, _AYA)),
    _r("ив"), _r("ыв"),
    _r("в", (2, _AYA)),
])

_REFLEXIVE = ("among", "rv", [_r("ся"), _r("сь")])

_ADJECTIVE = ("among", "rv", [
    _r("ими"), _r("ыми"),
    _r("его"), _r("ого"), _r("ему"), _r("ому"),
    _r("ее"), _r("ие"), _r("ые"), _r("ое"), _r("ей"), _r("ий"),
    _r("ый"), _r("ой"), _r("ем"), _r("им"), _r("ым"), _r("ом"),
    _r("их"), _r("ых"), _r("ую"), _r("юю"), _r("ая"), _r("яя"),
    _r("ою"), _r("ею"),
])

_PARTICIPLE = ("among", "rv", [
    _r("ивш"), _r("ывш"), _r("ующ"),
    _r("ем", (3, _AYA)), _r("нн", (3, _AYA)), _r("вш", (3, _AYA)),
    _r("ющ", (3, _AYA)), _r("щ", (2, _AYA)),
])

_VERB = ("among", "rv", [
    _r("ейте"), _r("уйте"),
    _r("ешь", (4, _AYA)), _r("нно", (4, _AYA)),
    _r("ете", (4, _AYA)), _r("йте", (4, _AYA)),
    _r("ила"), _r("ыла"), _r("ена"), _r("ите"), _r("или"), _r("ыли"),
    _r("ило"), _r("ыло"), _r("ено"), _r("ует"), _r("уют"), _r("ены"),
    _r("ить"), _r("ыть"), _r("ишь"),
    _r("ла", (3, _AYA)), _r("на", (3, _AYA)), _r("ли", (3, _AYA)),
    _r("ем", (3, _AYA)), _r("ло", (3, _AYA)), _r("но", (3, _AYA)),
    _r("ет", (3, _AYA)), _r("ют", (3, _AYA)), _r("ны", (3, _AYA)),
    _r("ть", (3, _AYA)),
    _r("ей"), _r("уй"), _r("ил"), _r("ыл"), _r("им"), _r("ым"),
    _r("ен"), _r("ят"), _r("ит"), _r("ыт"), _r("ую"), _r("ю"),
    _r("й", (2, _AYA)), _r("л", (2, _AYA)), _r("н", (2, _AYA)),
])

_NOUN = ("among", "rv", [
    _r("иями"), _r("ями"), _r("ами"),
    _r("ией"), _r("иям"), _r("ием"), _r("иях"),
    _r("ев"), _r("ов"), _r("ие"), _r("ье"), _r("еи"), _r("ии"),
    _r("ей"), _r("ой"), _r("ий"), _r("ям"), _r("ем"), _r("ам"),
    _r("ом"), _r("ах"), _r("ях"), _r("ию"), _r("ью"), _r("ия"),
    _r("ья"), _r("а"), _r("е"), _r("и"), _r("й"), _r("о"), _r("у"),
    _r("ы"), _r("ь"), _r("ю"), _r("я"),
])

_RU_TIDY = ("or", [
    # (1) undouble н, or (2) drop a superlative ending then undouble н,
    # or (3) drop a final soft sign — first success wins
    ("among", "rv", [_r("н", (2, "н"))]),
    ("ifchanged",
     ("among", "rv", [_r("ейше"), _r("ейш")]),
     ("among", "rv", [_r("н", (2, "н"))])),
    ("among", "rv", [_r("ь")]),
])

RU_SPEC = {
    "vowels": _RU_V,
    "min_r1": 0,
    # every Russian step runs inside `setlimit tomark pV`: gating
    # а/я characters must themselves lie within RV
    "checks_in_region": True,
    "prog": ("seq", [
        ("or", [
            _PERFECTIVE_GERUND,
            ("seq", [
                _REFLEXIVE,
                ("or", [
                    ("ifchanged", _ADJECTIVE, _PARTICIPLE),
                    _VERB,
                    _NOUN,
                ]),
            ]),
        ]),
        ("among", "rv", [_r("и")]),
        ("among", "r2", [_r("ость"), _r("ост")]),
        _RU_TIDY,
    ]),
}

# English: the reference routes en -> stemmer_porter (tok/stemmers.go:37);
# bleve's token/porter wraps blevesearch/go-porterstemmer v1.0.3, a rune
# port of Martin Porter's canonical porter.c (public domain). porter.c is
# the 1980 paper PLUS three departures the implementation documents:
# step-2 'bli'->'ble' replaces the paper's 'abli'->'able', step-2 gains
# 'logi'->'log', and words of length <= 2 return unchanged. Postgres
# dict_snowball's 'porter' language implements the PAPER version (probed:
# nobly->nobli, technology->technologi, as->a), so the fuzz gate diffs the
# paper twin EN_SPEC_PG against it and the three departures are pinned by
# hand vectors from porter.c (tests/test_snowball.py).
_EN_V = "aeiouy"

# step 1b follow-up after deleting ed/ing: at/bl/iz gain an e, a double
# consonant undoubles, else m=1 + *o appends e (porter.c step1ab tail;
# the ''-suffix among is Snowball's `atmark p1 test shortv`). porter.c
# undoubles ANY double consonant except l/s/z (doublec()); Snowball's
# porter.sbl only the literal pairs bb dd ff gg mm nn pp rr tt (fuzz
# probe: efkgkked -> efkgk in porter.c terms, efkgkk per PG) — the
# fourth behavioural departure, parameterized below.
def _en_1b_tail(departures: bool):
    return ("or", [
        ("among", None, [_r("at", repl="ate"), _r("bl", repl="ble"),
                         _r("iz", repl="ize")]),
        ("undouble", None,
         "bcdfghjkmnpqrtvwx" if departures else "bdfgmnprt"),
        ("among", None, [("", (("r1len0",), ("shortv", 0)), ("app", "e"))]),
    ])

_EN_STEP1A = ("among", None, [
    _r("sses", repl="ss"), _r("ies", repl="i"),
    _r("ss", action=("noop",)), _r("s"),
])
def _en_step1b(departures: bool):
    tail = _en_1b_tail(departures)
    return ("among", None, [
        ("eed", (("inr", "r1", 3),), ("repl", "ee")),
        ("ed", (("vstem", 2),), _DEL, tail),
        ("ing", (("vstem", 3),), _DEL, tail),
    ])
# (*v*) y -> i; the prelude leaves vowel-y lowercase and marks
# consonant-y as Y, and porter.c's ends("y") is a raw char compare, so
# both spellings rewrite
_EN_STEP1C = ("among", None, [
    ("y", (("vstem", 1),), ("repl", "i")),
    ("Y", (("vstem", 1),), ("repl", "i")),
])

_EN_STEP3 = ("among", "r1", [
    _r("icate", repl="ic"), _r("ative"), _r("alize", repl="al"),
    _r("iciti", repl="ic"), _r("ical", repl="ic"), _r("ful"),
    _r("ness"),
], "check")
_EN_STEP4 = ("among", "r2", [
    _r("al"), _r("ance"), _r("ence"), _r("er"), _r("ic"), _r("able"),
    _r("ible"), _r("ant"), _r("ement"), _r("ment"), _r("ent"),
    ("ion", ((4, "st"),), _DEL), _r("ou"), _r("ism"), _r("ate"),
    _r("iti"), _r("ous"), _r("ive"), _r("ize"),
], "check")
# ['e'] (R2 or (R1 not shortv)) delete — porter.c step5 m>1, or m=1
# without *o
_EN_STEP5A = ("or", [
    ("among", "r2", [_r("e")]),
    ("among", "r1", [("e", (("not_shortv", 1),), _DEL)]),
])
_EN_STEP5B = ("among", "r2", [("l", ((2, "l"),), _DEL)])


def _en_spec(departures: bool) -> dict:
    step2 = [
        _r("ational", repl="ate"), _r("tional", repl="tion"),
        _r("enci", repl="ence"), _r("anci", repl="ance"),
        _r("izer", repl="ize"),
        _r("bli", repl="ble") if departures else _r("abli", repl="able"),
        _r("alli", repl="al"), _r("entli", repl="ent"), _r("eli", repl="e"),
        _r("ousli", repl="ous"), _r("ization", repl="ize"),
        _r("ation", repl="ate"), _r("ator", repl="ate"),
        _r("alism", repl="al"), _r("iveness", repl="ive"),
        _r("fulness", repl="ful"), _r("ousness", repl="ous"),
        _r("aliti", repl="al"), _r("iviti", repl="ive"),
        _r("biliti", repl="ble"),
    ]
    if departures:
        step2.append(_r("logi", repl="log"))
    steps = [_EN_STEP1A, _en_step1b(departures), _EN_STEP1C,
             ("among", "r1", step2, "check"), _EN_STEP3, _EN_STEP4,
             _EN_STEP5A, _EN_STEP5B]
    stages = [
        # prelude: initial y and y-after-vowel become consonant Y
        # (porter.c cons(): y is a consonant iff at start or after a
        # non-consonant; global LTR replace matches Snowball's repeat
        # goto because a fresh Y breaks the following pair)
        ("re", [("^y", "Y"), ("([aeiouy])y", "$1Y")]),
    ] + [("plain_unmarked", p) for p in steps] + [
        ("strip",),
        ("tr", "Y", "y"),   # postlude
    ]
    if departures:
        # porter.c: if (k <= k0+1) return — length<=2 words untouched
        stages.insert(0, ("mark_short", 2))
    return {"vowels": _EN_V, "min_r1": 0, "stages": stages}


EN_SPEC = _en_spec(True)
EN_SPEC_PG = _en_spec(False)   # fuzz-oracle twin only — never routed


# Turkish (tok/stemmers.go:52 routes tr -> stemmer_tr_snowball; the
# published algorithm is Çilden's "Stemming Turkish Words Using
# Snowball"). Control flow recovered empirically against Postgres 15's
# dict_snowball 'turkish' (the same generated C as bleve's port) —
# tests/golden/snowball_vectors.json pins multi-seed fuzz to 0 diffs.
#
# Shape: IF the word has >= 2 vowels: (1) strip ONE nominal-verb
# composite (a plain plural strip ABORTS further stemming — the
# continue_stemming_noun_suffixes flag); (2) strip ONE noun-suffix
# chain (case + possessive + plural + the recursive ki-chain);
# (3) postlude: append the harmony vowel to stems ending d/g, then
# devoice a final b/c/ğ (d->t is dead code after the append).
#
# Empirical findings the spec encodes (probe words in parentheses):
# - check_vowel_harmony is an EXISTS scan: the last vowel v1 passes if
#   any vowel of its harmony class occurs ANYWHERE left of it
#   (tenaler -> tena but tonaler stays).
# - optional-letter rules: a y/n/s buffer letter must itself follow a
#   vowel; WITHOUT the buffer the suffix needs vowel-consonant before
#   it (skip one char, require a vowel: tonadı stays, tonattı ->
#   tonat); possessives invert both tests (non-vowel).
# - mark_ken and mark_sUnUz skip the harmony check (tonalarken ->
#   tona, tonasünüz -> to, but tonasün -> tonas via the possessive);
#   possessives skip it too (tonamiz -> tona).
# - the cAsInA composite of the published paper never fires in the
#   shipped Snowball (tonamışcasına -> tonamışca).
_TR_V = "aeıioöuü"
_TR_HARMONY = {"a": "aıou", "e": "eiöü", "ı": "aı", "i": "ei",
               "o": "ou", "ö": "öü", "u": "ou", "ü": "öü"}
_TR_H = ("harmony",)


def _tr_am(rules):
    # "stash" region = the stem part of a held token (whole token
    # otherwise); with checks_in_region this keeps every suffix match
    # and positional check inside the stem when a head is held
    return ("among", "stash", list(rules))


def _tr_suf(cores, *checks):
    return [(s, tuple(checks), _DEL) for s in cores]


def _tr_opt(cores, letter, harmony=True):
    """Suffix family with an optional buffer letter (y/n/s): the
    letter-variant needs a vowel before the letter; the bare variant
    needs a vowel one char further back (the skip-one probe)."""
    rules = []
    for s in cores:
        base = (_TR_H,) if harmony else ()
        rules.append((letter + s, base + ((len(s) + 2, _TR_V),), _DEL))
        rules.append((s, base + ((len(s) + 2, _TR_V),), _DEL))
    return rules


_U4 = ["ı", "i", "u", "ü"]
_nU = ["n" + u for u in _U4]

# --- verb-suffix amongs
_TR_ymUs = _tr_am(_tr_opt(["m" + u + "ş" for u in _U4], "y"))
# yDU covers the fused person forms too: -DU, -DUm, -DUn, -DUk
# (geldim/geldin/geldik -> gel; tonadım keeps its dı via the
# possessive because the skip-one-vowel probe fails)
_TR_yDU = _tr_am(_tr_opt([d + u + p for d in "dt" for u in _U4
                          for p in ("", "m", "n", "k")], "y"))
# ysA likewise fuses persons and skips the harmony check
# (tonayse -> to despite e-after-a/o)
_TR_ysA = _tr_am(_tr_opt([s + p for s in ("sa", "se")
                          for p in ("", "m", "n", "k")], "y",
                         harmony=False))
_TR_ken = _tr_am(_tr_opt(["ken"], "y", harmony=False))
_TR_sUnUz = _tr_am(_tr_suf(["s" + a + "n" + a + "z" for a in _U4]))
_TR_yUz = _tr_am(_tr_opt([u + "z" for u in _U4], "y"))
_TR_sUn = _tr_am(_tr_suf(["s" + u + "n" for u in _U4], _TR_H))
_TR_yUm = _tr_am(_tr_opt([u + "m" for u in _U4], "y"))
_TR_nUz = _tr_am(_tr_suf(["n" + u + "z" for u in _U4], _TR_H))
_TR_DUr = _tr_am(_tr_suf([d + u + "r" for d in "dt" for u in _U4], _TR_H))
_TR_lAr = _tr_am(_tr_suf(["lar", "ler"], _TR_H))

# --- noun-suffix amongs
_TR_lArI = _tr_am(_tr_suf(["ları", "leri"]))
_TR_ncA = _tr_am(_tr_opt(["ca", "ce"], "n"))
_TR_DA = _tr_am(_tr_suf([d + a for d in "dt" for a in "ae"], _TR_H))
_TR_ndA = _tr_am(_tr_suf(["nda", "nde"], _TR_H))
_TR_DAn = _tr_am(_tr_suf([d + a + "n" for d in "dt" for a in "ae"],
                         _TR_H))
_TR_ndAn = _tr_am(_tr_suf(["ndan", "nden"], _TR_H))
_TR_ylA = _tr_am(_tr_opt(["la", "le"], "y"))
_TR_ki = _tr_am(_tr_suf(["ki"]))
_TR_nUn = _tr_am(_tr_opt([u + "n" for u in _U4], "n"))
_TR_nUacc = _tr_am(_tr_suf(_nU, _TR_H))
_TR_yA = _tr_am(_tr_opt(["a", "e"], "y"))
_TR_yU = _tr_am(_tr_opt(_U4, "y"))
# bare-U strip used in chain tails (mark_sU: harmony + U + optional s)
_TR_sU = _tr_am(
    [("s" + u, (_TR_H, (3, _TR_V)), _DEL) for u in _U4]
    + [(u, (_TR_H, (3, _TR_V)), _DEL) for u in _U4])

# possessives: optional U buffer, both tests inverted (non-vowel) and
# EXISTENCE-requiring (Snowball `test non-vowel` fails at the limit:
# 'anda' keeps its n, 'emuz' is untouched); no harmony (tonamiz->tona)
def _tr_poss_rules():
    rules = []
    for core in ["m", "n"] + ["m" + u + "z" for u in _U4] \
            + ["n" + u + "z" for u in _U4]:
        for u in _U4:
            rules.append((u + core, (("cons", len(core) + 2),), _DEL))
        rules.append((core, ((len(core) + 1, "!ıiuü"),
                             ("cons", len(core) + 2)), _DEL))
    return rules


_TR_poss = _tr_am(_tr_poss_rules())


def _req(*items):
    return ("andseq", [(p, True) for p in items])


# The ki-chain ("[ki] + a MANDATORY continuation"; bare 'tonaki'
# stays; the DA alternative shadows ndA: tonasındaki -> tonas via
# da+possessive, then nUn) is RECURSIVE: after ki+DA(+poss/lAr), a
# further ki-chain may follow.  A direct unrolled expansion is
# exponential AND each of the ~17 noun-program call sites expands it
# again — round 7's Finnish trap at 9 MB of generated SQL.  Instead:
# every call site is terminal in its or-branch, so a site only needs
# (a) a DECISION — would the chain fire here? — which is the cheap
# mandatory core [ki + (DA|nUn)], and (b) a deferred EFFECT — raise
# KIFLAG and let dedicated if_kiflag stages run one chain LEVEL each.
# Each level's body is then generated exactly once per backend.
_KI_CORE = ("andseq", [
    (_TR_ki, True),
    (("or", [_TR_DA, _TR_nUn]), True),
])
# fires (raising KIFLAG, value otherwise untouched) iff the chain
# core would fire — exactly the chain's own success condition, since
# everything past the core is optional
_GKI = ("guarded_setflag", _KI_CORE)
_SETF = ("setflag",)
_DROP = ("dropheld",)
# lAr + a deferred ki-chain continuation (the chain recurses only
# THROUGH lAr after DA: tondakilerdeki -> to, tondakiteki -> tondaki)
_LAR_SETF = ("andseq", [(_TR_lAr, True), (_SETF, False)])
# [ndA|nA] matched and HELD, not deleted (Snowball keeps the bracket
# open): stash the head before the stem
_TR_HOLD = ("among", "stash",
            [(s, (_TR_H,), ("stash",)) for s in ("nda", "nde",
                                                 "na", "ne")])


def _tr_ki_level(emit: bool):
    """One ki-chain round: strip ki + mandatory (DA [+poss/lAr] |
    nUn [+lArI]); where the recursive continuation sat, raise KIFLAG
    for the next if_kiflag stage (emit=False on the last round drops
    the dead continuation, matching the unrolled depth)."""
    lar_tail = ("andseq", [(_TR_lAr, True)]
                + ([(_SETF, False)] if emit else []))
    # after DA the chain recurses only THROUGH lAr (tondakilerdeki ->
    # to, never bare: tondakiteki -> tondaki, PG-probed)
    da_tail = ("or", [
        ("andseq", [(_TR_poss, True), (lar_tail, False)]),
        lar_tail,
    ])
    # after nUn: lArI | sU | poss | bare recursion (aikininki -> aik
    # via sU, tonimizinkinin -> ton via poss, tondakininkinin -> to
    # via the bare chain)
    nun_tail = ("or", [
        _TR_lArI,
        ("andseq", [(_TR_sU, True), (lar_tail, False)]),
        ("andseq", [(_TR_poss, True), (lar_tail, False)]),
    ] + ([_SETF] if emit else []))
    return ("andseq", [
        (_TR_ki, True),
        (("or", [
            ("andseq", [(_TR_DA, True), (da_tail, False)]),
            ("andseq", [(_TR_nUn, True), (nun_tail, False)]),
        ]), True),
    ])


_KI = _GKI
_LAR_KI = ("andseq", [(_TR_lAr, True), (_GKI, False)])

_TR_NOUN = ("or", [
    # [lAr] + try(ki-chain)
    ("andseq", [(_TR_lAr, True), (_KI, False)]),
    # [ncA] + try(lArI | sU | poss | lAr) — lArI first
    # (kmtadalerince -> kmtada, ıztakilarınca -> ıztaki;
    # tonasınca -> tona via sU)
    ("andseq", [(_TR_ncA, True),
                (("or", [_TR_lArI,
                         ("andseq", [(_TR_sU, True), (_LAR_KI, False)]),
                         ("andseq", [(_TR_poss, True), (_LAR_KI, False)]),
                         _LAR_SETF]), False)]),
    # [ndA|nA] HELD, not deleted + MANDATORY (lArI | sU+try(lAr ki) |
    # ki-chain): lArI/sU extend the deletion through the head
    # (tonlarında->ton, tonusunda->tonu) while the ki-chain runs left
    # of the held head which then survives (audakinde->aunde,
    # tonlardakine->tonne, tondakina->tona)
    ("andseq", [(_TR_HOLD, True),
                (("or", [("andseq", [(_TR_lArI, True), (_DROP, True)]),
                         ("andseq", [(_TR_sU, True), (_DROP, True),
                                     (_LAR_SETF, False)]),
                         _GKI]), True)]),
    # [ndAn|nU] + MANDATORY sU+try(lAr ki)  (tonunu->ton; no lArI:
    # toblerini -> tobler, not tob)
    ("andseq", [(("or", [_TR_ndAn, _TR_nUacc]), True),
                (("andseq", [(_TR_sU, True), (_LAR_KI, False)]), True)]),
    # [DAn] + try(poss+try(lAr ki) | lAr+try(ki) | ki)
    ("andseq", [(_TR_DAn, True),
                (("or", [("andseq", [(_TR_poss, True), (_LAR_KI, False)]),
                         _LAR_KI, _KI]), False)]),
    # [ylA] + try(sU.. | poss.. | lAr+try(ki | bare U) | ki)
    # (tonularla->ton; sU not lArI: bmpzücjrlarıyla keeps its lar;
    # trailing ki-chain: tondakiyle->to, tonlardakiyle->ton)
    ("andseq", [(_TR_ylA, True),
                (("or", [("andseq", [(_TR_sU, True), (_LAR_KI, False)]),
                         ("andseq", [(_TR_poss, True), (_LAR_KI, False)]),
                         ("andseq", [(_TR_lAr, True),
                                     (("or", [_KI, _TR_sU, _TR_poss]),
                                      False)]),
                         _KI]),
                 False)]),
    # [nUn] + try(sU.. | ki | poss.. | lAr+try(ki | bare U)) — sU
    # BEFORE the ki-chain (aadpkindekinin -> aadpkindek, while
    # tonadakinin -> tona still chains because sU fails harmony;
    # tonuların->ton, tonamızın->tona; no lArI: dlarının -> dlar)
    ("andseq", [(_TR_nUn, True),
                (("or", [("andseq", [(_TR_sU, True), (_LAR_KI, False)]),
                         _KI,
                         ("andseq", [(_TR_poss, True), (_LAR_KI, False)]),
                         ("andseq", [(_TR_lAr, True),
                                     (("or", [_TR_lArI, _KI, _TR_sU,
                                              _TR_poss]), False)])]),
                 False)]),
    # [DA] + try(poss+try(lAr ki..) | lAr+try(ki..)) — the ki-chain
    # continues after DA+lAr (tondakilerdeymiş -> to)
    ("andseq", [(_TR_DA, True),
                (("or", [("andseq", [(_TR_poss, True),
                                     (_LAR_SETF, False)]),
                         _LAR_SETF]), False)]),
    # [yA] + try(poss+try(lAr ki..) | lAr+try(ki..))
    # (kmctpkininkilere -> kmctpki)
    ("andseq", [(_TR_yA, True),
                (("or", [("andseq", [(_TR_poss, True),
                                     (_LAR_SETF, False)]),
                         _LAR_SETF]), False)]),
    # [lArI]
    _TR_lArI,
    # ki-chain standalone — BEFORE yU (tenedeki -> tene)
    _KI,
    # [yU] + try(poss | lAr+try(ki..))  (tonumuzu -> ton,
    # tonlaru -> ton, ouşçtimizdekileru -> ouşçt)
    ("andseq", [(_TR_yU, True),
                (("or", [("andseq", [(_TR_poss, True),
                                     (_LAR_SETF, False)]),
                         _LAR_SETF]), False)]),
    # [poss] + try(lAr+try(ki))  (tonularımız -> tonu)
    ("andseq", [(_TR_poss, True), (_LAR_KI, False)]),
])

_TR_cAsInA = _tr_am(_tr_suf(["casına", "cesine"]))

_TR_VERB = [
    # B1: simple tense suffixes
    (("or", [_TR_ymUs, _TR_yDU, _TR_ysA, _TR_ken]), False),
    # B2: -cAsInA + (person)? + MANDATORY -ymUş to its left
    # (ceröılmışcasına -> ceröıl, but tonamışcasına -> tonamışca via
    # the noun nA+sU chain because mış fails the skip-one-vowel probe)
    (("andseq", [(_TR_cAsInA, True),
                 (("or", [_TR_sUnUz, _TR_lAr, _TR_yUm, _TR_sUn,
                          _TR_yUz]), False),
                 (_TR_ymUs, True)]), False),
    # B3: plural + try(copula) — ABORTS noun stemming (tonudurlar->tonu)
    (("andseq", [(_TR_lAr, True),
                 (("or", [_TR_DUr, _TR_yDU, _TR_ysA, _TR_ymUs]), False)]),
     True),
    # B4: -nUz + mandatory past/conditional (geldiniz)
    (_req(_TR_nUz, ("or", [_TR_yDU, _TR_ysA])), False),
    # B5: person suffixes + try(-mUş)  (tonarmışsın -> tonar)
    (("andseq", [(("or", [_TR_sUnUz, _TR_yUz, _TR_sUn, _TR_yUm]), True),
                 (_TR_ymUs, False)]), False),
    # B6: -DUr + try((person|plural)? -mUş)  (tonamıştır -> tona)
    (("andseq", [(_TR_DUr, True),
                 (("andseq", [(("or", [_TR_sUnUz, _TR_lAr, _TR_yUm,
                                       _TR_sUn, _TR_yUz]), False),
                              (_TR_ymUs, True)]), False)]), False),
]

# append the harmony U to d/g-final stems — except the reserved words
# ad/soyad (adı -> ad, soyadı -> soyad, with no trailing vowel)
_TR_APPEND_U = ("or", [
    ("among", None, [(c, (("lastv", vs), ("ne", ("ad", "soyad"))),
                      ("app", u))])
    for c in "dg" for vs, u in (("aı", "ı"), ("ei", "i"),
                                ("ou", "u"), ("öü", "ü"))
])
# final-consonant devoicing; d->t fires only when the append could
# not (vowelless stems like 'kd' -> 'kt'), and never for the reserved
# words ('adı' -> 'ad', not 'at')
_TR_DEVOICE = ("among", None, [
    ("b", (), ("repl", "p")), ("c", (), ("repl", "ç")),
    ("d", (("ne", ("ad", "soyad")),), ("repl", "t")),
    ("ğ", (), ("repl", "k")),
])

TR_SPEC = {
    "vowels": _TR_V,
    "min_r1": 0,
    "harmony": _TR_HARMONY,
    "restore_empty": True,
    "checks_in_region": True,        # bound checks to the stem part
    "stages": [
        ("mark_few_vowels", 2),      # more_than_one_syllable_word gate
        ("flag_or", _TR_VERB),       # one nominal-verb composite
        ("unless_flag", _TR_NOUN),   # one noun-suffix chain
        # deferred ki-chain rounds (see _tr_ki_level): depth-2 unroll
        # = three levels, the last with no further continuation
        ("if_kiflag", _tr_ki_level(True)),
        ("if_kiflag", _tr_ki_level(True)),
        ("if_kiflag", _tr_ki_level(False)),
        ("unstash",),                # reattach a held ndA/nA head
        # the plural-abort path skips the postlude too (csüçvibler
        # keeps its b, sonuglar gets no appended U)
        ("unless_flag", _TR_APPEND_U),
        ("unless_flag", _TR_DEVOICE),
        ("strip_all",),
    ],
}

SNOWBALL_LANGS = {"da": DA_SPEC, "no": NO_SPEC, "sv": SV_SPEC,
                  "ru": RU_SPEC, "nl": NL_SPEC, "ro": RO_SPEC,
                  "fi": FI_SPEC, "hu": HU_SPEC, "en": EN_SPEC,
                  "tr": TR_SPEC}

# Stage plans for the expression backends: each entry becomes ONE
# F.transform / list_transform pass. kinds:
#   ("plain", prog)  run prog on the bare token (language uses no marks)
#   ("alt", prog)    skip when MARK'd; on change, prefix MARK
#   ("alt_aux", A)   skip when MARK'd; on change, prefix AUX
#   ("aux_try", B)   when AUX'd: strip AUX, try B, prefix MARK
#   ("strip",)       drop any MARK
_RU_STAGES = [
    ("alt", _PERFECTIVE_GERUND),
    # branch 2 of the step-1 alternation: reflexive is a bare `try`
    # (it alone does not satisfy the or), then adjectival/verb/noun
    ("plain_unmarked", _REFLEXIVE),
    ("alt_aux", _ADJECTIVE),
    ("aux_try", _PARTICIPLE),
    ("alt", _VERB),
    ("alt", _NOUN),
    ("strip",),
    ("plain", ("among", "rv", [_r("и")])),
    ("plain", ("among", "r2", [_r("ость"), _r("ост")])),
    ("plain", _RU_TIDY),
]


def _stage_plan(lang: str):
    spec = SNOWBALL_LANGS[lang]
    if "stages" in spec:
        return spec["stages"]
    if lang == "ru":
        return _RU_STAGES
    # da/no/sv: the program is a flat seq of small steps
    return [("plain", p) for p in spec["prog"][1]]


def _sorted_rules(rules):
    """Longest suffix first — Snowball among picks the longest match."""
    return sorted(rules, key=lambda r: -len(r[0]))


def _region_re(spec: dict, region: str) -> str:
    v = spec["vowels"]
    if region == "r1" and spec.get("r1_style") == "hu":
        # Hungarian R1: word starts with a vowel -> after the first
        # consonant or digraph; starts with a consonant -> after the
        # first vowel (digraph alternatives longest-first)
        return (f"^(?:[{v}]+(?:dzs|cs|dz|gy|ly|ny|sz|ty|zs|[^{v}])"
                f"|[^{v}]+[{v}])(.*)$")
    if region == "rv" and spec.get("rv_style") == "es":
        # Spanish-family RV (Romanian): C V . -> after 3rd char;
        # V C -> after the next vowel; V V -> after the next
        # consonant; C C -> after the next vowel. Alternatives are
        # mutually exclusive on the first two characters.
        return (f"^(?:[^{v}][{v}].|[{v}][^{v}][^{v}]*[{v}]"
                f"|[{v}][{v}][{v}]*[^{v}]|[^{v}][^{v}][^{v}]*[{v}])"
                f"(.*)$")
    if region == "rv":
        return f"^.*?[{v}](.*)$"
    if region == "r1":
        return f"^.*?[{v}][^{v}](.*)$"
    if region == "r2":
        return f"^.*?[{v}][^{v}].*?[{v}][^{v}](.*)$"
    raise KeyError(region)


# --------------------------------------------------------------- python

def _ulen(spec, s: str) -> int:
    """Length in the spec's region units (chars, or bytes for specs
    whose Snowball source clamps with raw byte constants)."""
    return len(s.encode("utf-8")) if spec.get("units") == "bytes" \
        else len(s)


def _py_region_len(spec, region, t):
    if region == "stash":
        # everything after the held-suffix separator (the whole token
        # when nothing is held): suffix matches and checks stay inside
        # the stem part of "head^stem"
        i = t.find(SEP)
        return len(t) - (i + 1) if i >= 0 else len(t)
    m = re.match(_region_re(spec, region), t)
    n = _ulen(spec, m.group(1)) if m else 0
    if region == "r1" and spec["min_r1"]:
        n = min(n, max(_ulen(spec, t) - spec["min_r1"], 0))
    return n


def _py_eff(t):
    """The stem part of a stashed token (t unchanged when no hold)."""
    i = t.find(SEP)
    return t[i + 1:] if i >= 0 else t


def _py_check_one(t, idx, chars, limit):
    neg = chars.startswith("!")
    cs = chars[1:] if neg else chars
    if limit is not None and idx > limit:
        # bounded test: the cursor cannot move before the region
        # start, so the test FAILS regardless of negation (Snowball
        # setlimit semantics — ro verb step, ru)
        return False
    if idx > len(t):
        return neg  # out of range: a negated check passes
    inside = t[-idx] in cs
    return not inside if neg else inside


def _py_kind_check(spec, t, c):
    """Non-positional check kinds (Porter / Turkish conditions)."""
    v = spec["vowels"]
    kind = c[0]
    if kind == "harmony":
        # Snowball goto-scan harmony: the last vowel's class must
        # occur somewhere LEFT of it (tenaler -> tena, tonaler stays);
        # scoped to the stem part when a head suffix is stashed
        e = _py_eff(t)
        m = re.search(f"[{v}][^{v}]*$", e)
        if not m:
            return False
        allowed = spec["harmony"][e[m.start()]]
        return any(ch in allowed for ch in e[:m.start()])
    if kind == "lastv":        # last vowel of the token is in c[1]
        e = _py_eff(t)
        m = re.search(f"[{v}][^{v}]*$", e)
        return bool(m) and e[m.start()] in c[1]
    if kind == "cons":
        # char idx-from-end EXISTS and is a non-vowel (Snowball
        # `test non-vowel` fails at the limit, unlike a negated
        # positional check which passes out-of-range)
        return c[1] <= len(_py_eff(t)) and t[-c[1]] not in v
    if kind == "ne":           # token is none of the reserved words
        return t not in c[1]
    if kind == "inr":          # suffix of length c[2] lies inside region
        return _py_region_len(spec, c[1], t) >= c[2]
    if kind == "r1len0":       # Snowball `atmark p1` (m == 1 gate)
        return _py_region_len(spec, "r1", t) == 0
    if kind == "vstem":        # stem before the c[1]-char suffix has a vowel
        stem = t[:-c[1]] if c[1] else t
        return any(ch in v for ch in stem)
    if kind in ("shortv", "not_shortv"):
        # Porter *o: stem (before the c[1]-char suffix) ends
        # consonant-vowel-consonant with the final consonant not w/x/Y
        n = c[1]
        ok = (len(t) >= n + 3
              and t[-(n + 1)] not in v + "wxY"
              and t[-(n + 2)] in v
              and t[-(n + 3)] not in v)
        return ok if kind == "shortv" else not ok
    raise KeyError(kind)


def _py_check_elem(spec, t, c, limit):
    if c[0] == "or":
        return any(all(_py_check_elem(spec, t, e, limit) for e in g)
                   for g in c[1:])
    if isinstance(c[0], str):
        return _py_kind_check(spec, t, c)
    return _py_check_one(t, c[0], c[1], limit)


def _py_checks(spec, t, checks, limit=None):
    return all(_py_check_elem(spec, t, c, limit) for c in checks)


def _py_action(t, suffix, action):
    if action[0] == "noop":
        return t
    if action[0] == "app":     # append without consuming (Porter <+ 'e')
        return t + action[1]
    base = t[:-len(suffix)] if suffix else t
    if action[0] == "repl":
        return base + action[1]
    if action[0] == "repl_ext":
        # replace the suffix AND action[1] preceding chars (Romanian
        # 'iune' preceded by ţ -> both become 't')
        return t[:-(len(suffix) + action[1])] + action[2]
    if action[0] == "del_u":
        if len(base) >= 2 and base[-1] == base[-2] and base[-1] in "kdt":
            return base[:-1]
        return base
    if action[0] == "stash":
        # hold: move the matched head in front of the stem so inner
        # programs keep working on the string tail (Turkish ndA/nA)
        return suffix + SEP + base
    return base  # del


def _py_among(spec, region, rules, t, mode="limit"):
    rlen = _py_region_len(spec, region, t) if region else _ulen(spec, t)
    bounded = spec.get("checks_in_region") or mode.endswith("_cb")
    limit = _ulen(spec, t) if mode.startswith("check") else rlen
    climit = rlen if bounded else None
    for rule in _sorted_rules(rules):
        suffix, checks, action = rule[0], rule[1], rule[2]
        follow = rule[3] if len(rule) > 3 else None
        if _ulen(spec, suffix) <= limit and t.endswith(suffix):
            if mode.startswith("check") and _ulen(spec, suffix) > rlen:
                return t  # matched but outside region: among FAILS
            if not _py_checks(spec, t, checks, climit):
                return t  # matched but failed the gate: among FAILS
            out = _py_action(t, suffix, action)
            if follow is not None and out != t:
                out = _py_run(spec, follow, out)
            return out
    return t


def _py_run(spec, prog, t):
    op = prog[0]
    if op == "among":
        mode = prog[3] if len(prog) > 3 else "limit"
        return _py_among(spec, prog[1], prog[2], t, mode)
    if op == "undouble":
        region = prog[1]
        chars = prog[2] if len(prog) > 2 else None
        limit = _py_region_len(spec, region, t) if region else len(t)
        dbl = (limit >= 1 and len(t) >= 2 and t[-1] == t[-2]
               and (t[-1] in chars if chars
                    else t[-1] not in spec["vowels"]))
        if dbl:
            return t[:-1]
        return t
    if op == "undouble_vtail":
        # final double consonant followed by zero or more vowels, the
        # whole double within the region: drop its last letter
        # (Finnish step 6e: eläkk -> eläk, aatonaatto -> aatonaato)
        rlen = _py_region_len(spec, prog[1], t) if prog[1] else len(t)
        k = len(t)
        while k > 0 and t[k - 1] in spec["vowels"]:
            k -= 1
        if (k >= 2 and t[k - 1] == t[k - 2]
                and t[k - 1] not in spec["vowels"]
                and rlen >= len(t) - k + 2):
            return t[:k - 1] + t[k:]
        return t
    if op == "seq":
        for p in prog[1]:
            t = _py_run(spec, p, t)
        return t
    if op == "rep":
        # Snowball `repeat` with a bounded unroll for the expression
        # backends; each firing shortens the token, so prog[1] passes
        # reach the fixpoint on any real-length token
        for _ in range(prog[1]):
            out = _py_run(spec, prog[2], t)
            if out == t:
                break
            t = out
        return t
    if op == "or":
        for p in prog[1]:
            out = _py_run(spec, p, t)
            if out != t:
                return out
        return t
    if op == "andseq":
        # Snowball and-sequence with restore: every REQUIRED member
        # must change the token, else the whole thing is undone
        # (Turkish composite suffix chains)
        out = t
        for p, required in prog[1]:
            nxt = _py_run(spec, p, out)
            if required and nxt == out:
                return t
            out = nxt
        return out
    if op == "ifchanged":
        out = _py_run(spec, prog[1], t)
        if out != t:
            return _py_run(spec, prog[2], out)
        return t
    if op == "setflag":
        # terminal in its branch by construction: nothing downstream
        # in the same stage ever sees the flagged value
        return KIFLAG + t
    if op == "guarded_setflag":
        # raise KIFLAG iff the guard program would fire; the value
        # itself is left for the if_kiflag stage to transform
        return KIFLAG + t if _py_run(spec, prog[1], t) != t else t
    if op == "dropheld":
        # erase the stashed head: its deletion extends through the
        # continuation suffix (Turkish ndA + lArI/sU compounds)
        i = t.find(SEP)
        return t[i + 1:] if i >= 0 else t
    raise KeyError(op)


def _py_mark_scan(spec, rules, t):
    """Exact Snowball prelude scan: one left-to-right pass; a char is
    marked (uppercased, making it a consonant for the region logic)
    when the PROCESSED previous char is an unmarked vowel — and, for
    needs_next chars (i/u between vowels), the RAW next char is a
    vowel. rules: ((char, needs_next), ...)."""
    v = spec["vowels"]
    need = dict(rules)
    out = []
    for k, c in enumerate(t):
        if (c in need and out and out[-1] in v
                and (not need[c]
                     or (k + 1 < len(t) and t[k + 1] in v))):
            out.append(c.upper())
        else:
            out.append(c)
    return "".join(out)


def _py_stages(spec, stages, t):
    flag = False
    for st in stages:
        k = st[0]
        if k == "mark_scan":
            t = _py_mark_scan(spec, st[1], t)
        elif k == "mark_short":
            # porter.c length guard: words this short skip every step
            # (stages that still see the mark — the `re` prelude and
            # the final `tr` postlude — are involutory on them)
            if len(t) <= st[1]:
                t = MARK + t
        elif k == "mark_few_vowels":
            # Turkish more_than_one_syllable_word gate
            if sum(ch in spec["vowels"] for ch in t) < st[1]:
                t = MARK + t
        elif k == "flag_or":
            # or-chain whose winning branch may raise the FLAG
            # ("stop noun stemming" — the Turkish plural branch)
            if not t.startswith(MARK):
                for p, raises in st[1]:
                    out = _py_run(spec, p, t)
                    if out != t:
                        t = (FLAG + out) if raises else out
                        break
        elif k == "unless_flag":
            if not t.startswith(MARK) and not t.startswith(FLAG):
                t = _py_run(spec, st[1], t)
        elif k == "if_kiflag":
            # consume the pending ki-round flag; st[1] may raise a
            # fresh one for the next if_kiflag stage
            if t.startswith(KIFLAG):
                t = _py_run(spec, st[1], t[1:])
        elif k == "unstash":
            # reattach a held head suffix: "head^stem" -> "stemhead"
            i = t.find(SEP)
            if i >= 0:
                t = t[i + 1:] + t[:i]
        elif k == "plain_skip_mark":
            if not t.startswith(MARK):
                if t.startswith(FLAG):
                    t = FLAG + _py_run(spec, st[1], t[1:])
                else:
                    t = _py_run(spec, st[1], t)
        elif k == "strip_all":
            if t[:1] in (MARK, FLAG):
                t = t[1:]
        elif k == "plain_unmarked":
            if not t.startswith(MARK):
                t = _py_run(spec, st[1], t)
        elif k == "strip":
            if t.startswith(MARK):
                t = t[1:]
        elif k == "tr":
            t = t.translate(str.maketrans(st[1], st[2]))
        elif k == "re":
            for pat, rep in st[1]:
                t = re.sub(pat, rep.replace("$", "\\"), t)
        elif k == "plain":
            t = _py_run(spec, st[1], t)
        elif k == "flag_if_changed":
            out = _py_run(spec, st[1], t)
            flag = flag or out != t
            t = out
        elif k == "or_flag_second":
            out = _py_run(spec, st[1], t)
            if out == t:
                out = _py_run(spec, st[2], t)
                flag = flag or out != t
            t = out
        elif k == "branch_flag":
            t = _py_run(spec, st[1] if flag else st[2], t)
        elif k == "strip_flag":
            flag = False
        else:
            raise KeyError(k)
    return t


def snowball_stem_py(token: str, lang: str) -> str:
    spec = SNOWBALL_LANGS[lang]
    if "stages" in spec:
        out = _py_stages(spec, spec["stages"], token)
        if spec.get("restore_empty") and out == "":
            # a word that IS one of its suffixes comes back whole
            # (Turkish: 'siniz' stays, probed against dict_snowball)
            return token
        return out
    return _py_run(spec, spec["prog"], token)


# --------------------------------------------------------------- spark

_FAIL = "\x1f"   # andseq failure sentinel; tokens never contain it


def _sp_let(val: Column, body) -> Column:
    """Bind ``val`` once: transform over a 1-element array."""
    return F.transform(F.array(val), body).getItem(0)


def _sp_len(spec, t: Column) -> Column:
    return F.octet_length(t) if spec.get("units") == "bytes" \
        else F.length(t)


def _sp_region_len(spec, region, t: Column) -> Column:
    if region == "stash":
        # stem part of "head^stem" (whole token when nothing held):
        # instr is 0 without a separator, so this is just length
        return F.length(t) - F.instr(t, SEP)
    n = _sp_len(spec, F.regexp_extract(t, _region_re(spec, region), 1))
    if region == "r1" and spec["min_r1"]:
        n = F.least(n, F.greatest(_sp_len(spec, t) - spec["min_r1"],
                                  F.lit(0)))
    return n


def _sp_eff(t: Column) -> Column:
    """Stem part of a stashed token (t itself when no hold)."""
    return t.substr(F.instr(t, SEP) + 1, F.length(t))


def _sp_check_one(t: Column, idx, chars, limit) -> Column:
    neg = chars.startswith("!")
    cs = chars[1:] if neg else chars
    inside = (F.length(t) >= idx) & \
        t.substr(F.length(t) - (idx - 1), F.lit(1)).isin(*list(cs))
    out = ~inside if neg else inside
    if limit is not None:
        # bounded test fails outright before the region start
        out = out & (limit >= idx)
    return out


def _sp_kind_check(spec, t: Column, c, env=None) -> Column:
    v = spec["vowels"]
    kind = c[0]
    if env and kind in env:
        return env[kind]
    if kind == "inr":
        return _sp_region_len(spec, c[1], t) >= c[2]
    if kind == "r1len0":
        return _sp_region_len(spec, "r1", t) == 0
    if kind == "vstem":
        stem = t.substr(F.lit(1), F.length(t) - c[1]) if c[1] else t
        return stem.rlike(f"[{v}]")
    if kind in ("shortv", "not_shortv"):
        n = c[1]

        def at(k):
            return t.substr(F.length(t) - (k - 1), F.lit(1))

        ok = ((F.length(t) >= n + 3)
              & ~at(n + 1).isin(*list(v + "wxY"))
              & at(n + 2).isin(*list(v))
              & ~at(n + 3).isin(*list(v)))
        return ok if kind == "shortv" else ~ok
    if kind == "harmony":
        e = _sp_eff(t)
        pre = F.regexp_replace(e, f"[{v}][^{v}]*$", "")
        v1 = F.regexp_extract(e, f"([{v}])[^{v}]*$", 1)
        cond = F.lit(False)
        for vc, allowed in spec["harmony"].items():
            cond = cond | ((v1 == vc) & pre.rlike(f"[{allowed}]"))
        return cond
    if kind == "lastv":
        e = _sp_eff(t)
        v1 = F.regexp_extract(e, f"([{v}])[^{v}]*$", 1)
        return v1.isin(*list(c[1]))
    if kind == "cons":
        idx = c[1]
        ch = t.substr(F.length(t) - (idx - 1), F.lit(1))
        return (_sp_region_len(spec, "stash", t) >= idx) \
            & ~ch.isin(*list(v))
    if kind == "ne":
        return ~t.isin(*c[1])
    raise KeyError(kind)


def _sp_check_elem(spec, t: Column, c, limit, env=None) -> Column:
    if c[0] == "or":
        alt = F.lit(False)
        for g in c[1:]:
            gc = F.lit(True)
            for e in g:
                gc = gc & _sp_check_elem(spec, t, e, limit, env)
            alt = alt | gc
        return alt
    if isinstance(c[0], str):
        return _sp_kind_check(spec, t, c, env)
    return _sp_check_one(t, c[0], c[1], limit)


def _sp_checks(spec, t: Column, checks, limit=None, env=None) -> Column:
    cond = F.lit(True)
    for c in checks:
        cond = cond & _sp_check_elem(spec, t, c, limit, env)
    return cond


def _sp_action(t: Column, suffix, action) -> Column:
    if action[0] == "noop":
        return t
    if action[0] == "app":
        return F.concat(t, F.lit(action[1]))
    base = t.substr(F.lit(1), F.length(t) - len(suffix))
    if action[0] == "repl":
        return F.concat(base, F.lit(action[1]))
    if action[0] == "repl_ext":
        cut = t.substr(F.lit(1), F.length(t) - (len(suffix) + action[1]))
        return F.concat(cut, F.lit(action[2]))
    if action[0] == "del_u":
        last = base.substr(F.length(base), F.lit(1))
        dbl = (F.length(base) >= 2) \
            & (last == base.substr(F.length(base) - 1, F.lit(1))) \
            & last.isin("k", "d", "t")
        return F.when(dbl, base.substr(F.lit(1), F.length(base) - 1)) \
            .otherwise(base)
    if action[0] == "stash":
        return F.concat(F.lit(suffix + SEP), base)
    return base  # del


def _sp_among(spec, region, rules, t: Column, mode="limit") -> Column:
    rlen = _sp_region_len(spec, region, t) if region else _sp_len(spec, t)
    bounded = spec.get("checks_in_region") or mode.endswith("_cb")
    climit = rlen if bounded else None

    def body(env):
        expr = None
        for rule in _sorted_rules(rules):
            suffix, checks, action = rule[0], rule[1], rule[2]
            follow = rule[3] if len(rule) > 3 else None
            slen = _ulen(spec, suffix)
            ends = t.endswith(suffix) if suffix else F.lit(True)
            matched = ends if mode.startswith("check") else \
                (ends & (rlen >= slen))
            gate = _sp_checks(spec, t, checks, climit, env)
            if mode.startswith("check"):
                gate = gate & (rlen >= slen)
            res = _sp_action(t, suffix, action)
            if follow is not None:
                res = _sp_run(spec, follow, res)
            val = F.when(gate, res).otherwise(t)
            expr = F.when(matched, val) if expr is None else \
                expr.when(matched, val)
        return expr.otherwise(t)

    # the harmony condition is suffix-independent: bind it once per
    # among instead of expanding the 8-way scan inside every rule
    if any(("harmony",) in rule[1] for rule in rules):
        hcond = _sp_kind_check(spec, t, ("harmony",))
        return _sp_let(hcond, lambda h: body({"harmony": h}))
    return body(None)


def _sp_run(spec, prog, t: Column) -> Column:
    op = prog[0]
    if op == "among":
        mode = prog[3] if len(prog) > 3 else "limit"
        return _sp_among(spec, prog[1], prog[2], t, mode)
    if op == "undouble":
        region = prog[1]
        chars = prog[2] if len(prog) > 2 else None
        limit = _sp_region_len(spec, region, t) if region \
            else F.length(t)
        last = t.substr(F.length(t), F.lit(1))
        memb = last.isin(*list(chars)) if chars \
            else ~last.isin(*list(spec["vowels"]))
        dbl = (limit >= 1) & (F.length(t) >= 2) \
            & (last == t.substr(F.length(t) - 1, F.lit(1))) & memb
        return F.when(dbl, t.substr(F.lit(1), F.length(t) - 1)).otherwise(t)
    if op == "undouble_vtail":
        rlen = _sp_region_len(spec, prog[1], t) if prog[1] \
            else F.length(t)
        vw = list(spec["vowels"])
        tail = F.regexp_extract(t, f"[{''.join(vw)}]*$", 0)
        tlen = F.length(tail)
        k = F.length(t) - tlen
        c1 = t.substr(k, F.lit(1))
        c0 = t.substr(k - 1, F.lit(1))
        dbl = (k >= 2) & (c1 == c0) & (rlen >= tlen + 2)
        cut = F.concat(t.substr(F.lit(1), k - 1), tail)
        return F.when(dbl, cut).otherwise(t)
    if op == "seq":
        for p in prog[1]:
            t = _sp_run(spec, p, t)
        return t
    if op == "or":
        # alternatives as SIBLING array elements with a first-change
        # pick, not nested lets: binder cost in both engines grows
        # superlinearly with nesting depth (the Turkish noun chain at
        # 13 nested alternatives never finished binding)
        alts = [_sp_run(spec, p, t) for p in prog[1]]
        hit = F.filter(F.array(*alts), lambda a: a != t)
        return F.coalesce(F.get(hit, 0), t)
    if op == "andseq":
        # Snowball and-sequence with restore: required members must
        # change the token or the whole thing reverts. Failure is
        # propagated by a sentinel char no token can contain.
        items = prog[1]

        def build(i, cur):
            if i >= len(items):
                return cur
            p, required = items[i]
            nxt = _sp_run(spec, p, cur)
            if required:
                return _sp_let(nxt,
                               lambda n: F.when(n != cur,
                                                build(i + 1, n))
                               .otherwise(F.lit(_FAIL)))
            return _sp_let(nxt, lambda n: build(i + 1, n))

        return _sp_let(build(0, t),
                       lambda r: F.when(r == _FAIL, t).otherwise(r))
    if op == "ifchanged":
        attempt = _sp_run(spec, prog[1], t)
        return F.when(attempt != t, _sp_run(spec, prog[2], attempt)) \
            .otherwise(t)
    if op == "setflag":
        return F.concat(F.lit(KIFLAG), t)
    if op == "guarded_setflag":
        attempt = _sp_run(spec, prog[1], t)
        return _sp_let(attempt,
                       lambda a: F.when(a != t,
                                        F.concat(F.lit(KIFLAG), t))
                       .otherwise(t))
    if op == "dropheld":
        i = F.instr(t, SEP)
        return F.when(i > 0, t.substr(i + 1, F.length(t))).otherwise(t)
    raise KeyError(op)


def _sp_stage(spec, stage):
    kind = stage[0]

    def fn(t: Column) -> Column:
        if kind == "strip":
            return F.when(t.startswith(MARK),
                          t.substr(F.lit(2), F.length(t))).otherwise(t)
        if kind == "mark_short":
            return F.when(F.length(t) <= stage[1],
                          F.concat(F.lit(MARK), t)).otherwise(t)
        if kind == "mark_few_vowels":
            vw = spec["vowels"]
            nv = F.length(F.regexp_replace(t, f"[^{vw}]", ""))
            return F.when(nv < stage[1],
                          F.concat(F.lit(MARK), t)).otherwise(t)
        if kind == "flag_or":
            def mk_wrap(r):
                # single-arg lambda: F.transform passes the element
                # index to any second parameter, even a defaulted one
                return lambda a: F.when(
                    a != t,
                    F.concat(F.lit(FLAG), a) if r else a).otherwise(t)

            alts = []
            for p, raises in stage[1]:
                attempt = _sp_run(spec, p, t)
                alts.append(_sp_let(attempt, mk_wrap(raises)))
            hit = F.filter(F.array(*alts), lambda a: a != t)
            picked = F.coalesce(F.get(hit, 0), t)
            return F.when(t.startswith(MARK), t).otherwise(picked)
        if kind == "unless_flag":
            skip = t.startswith(MARK) | t.startswith(FLAG)
            return F.when(skip, t).otherwise(_sp_run(spec, stage[1], t))
        if kind == "if_kiflag":
            body = t.substr(F.lit(2), F.length(t))
            return F.when(
                t.startswith(KIFLAG),
                _sp_let(body, lambda b: _sp_run(spec, stage[1], b)),
            ).otherwise(t)
        if kind == "unstash":
            i = F.instr(t, SEP)
            return F.when(
                i > 0,
                F.concat(t.substr(i + 1, F.length(t)),
                         t.substr(F.lit(1), i - 1)),
            ).otherwise(t)
        if kind == "strip_all":
            return F.when(t.startswith(MARK) | t.startswith(FLAG),
                          t.substr(F.lit(2), F.length(t))).otherwise(t)
        if kind == "mark_scan":
            # exact left-to-right prelude scan as a character fold:
            # processed prev comes off the accumulator, raw next off
            # the (cur, next) pair array — pure JVM expressions
            v = list(spec["vowels"])
            pairs = F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(t), F.lit(1))),
                lambda i: t.substr(i, F.lit(2)))

            def step(acc, p):
                cur = p.substr(F.lit(1), F.lit(1))
                nxt = p.substr(F.lit(2), F.lit(1))
                prev = acc.substr(F.length(acc), F.lit(1))
                mc = cur
                for ch, needs in stage[1]:
                    c = (cur == ch) & prev.isin(*v)
                    if needs:
                        c = c & nxt.isin(*v)
                    mc = F.when(c, F.lit(ch.upper())).otherwise(mc)
                return F.concat(acc, mc)

            return F.aggregate(pairs, F.lit(""), step)
        if kind == "tr":
            return F.translate(t, stage[1], stage[2])
        if kind == "re":
            out = t
            for pat, rep in stage[1]:
                out = F.regexp_replace(out, pat, rep)  # $1 refs native
            return out
        if kind == "flag_if_changed":
            body = t.substr(F.lit(2), F.length(t))
            fed = _sp_run(spec, stage[1], body)
            attempt = _sp_run(spec, stage[1], t)
            return F.when(t.startswith(FLAG),
                          F.concat(F.lit(FLAG), fed)).otherwise(
                F.when(attempt != t,
                       F.concat(F.lit(FLAG), attempt)).otherwise(t))
        if kind == "branch_flag":
            body = t.substr(F.lit(2), F.length(t))
            return F.when(
                t.startswith(FLAG),
                F.concat(F.lit(FLAG), _sp_run(spec, stage[1], body)),
            ).otherwise(_sp_run(spec, stage[2], t))
        if kind == "or_flag_second":
            a = _sp_run(spec, stage[1], t)
            b = _sp_run(spec, stage[2], t)
            return F.when(a != t, a).otherwise(
                F.when(b != t, F.concat(F.lit(FLAG), b)).otherwise(t))
        if kind == "strip_flag":
            return F.when(t.startswith(FLAG),
                          t.substr(F.lit(2), F.length(t))).otherwise(t)
        if kind == "plain":
            if spec.get("uses_flag"):
                body = t.substr(F.lit(2), F.length(t))
                return F.when(
                    t.startswith(FLAG),
                    F.concat(F.lit(FLAG), _sp_run(spec, stage[1], body)),
                ).otherwise(_sp_run(spec, stage[1], t))
            return _sp_run(spec, stage[1], t)
        if kind == "plain_unmarked":
            return F.when(t.startswith(MARK), t) \
                .otherwise(_sp_run(spec, stage[1], t))
        if kind == "alt":
            done = t.startswith(MARK) | t.startswith(AUX)
            attempt = _sp_run(spec, stage[1], t)
            return F.when(done, t).otherwise(
                F.when(attempt != t, F.concat(F.lit(MARK), attempt))
                .otherwise(t))
        if kind == "alt_aux":
            done = t.startswith(MARK)
            attempt = _sp_run(spec, stage[1], t)
            return F.when(done, t).otherwise(
                F.when(attempt != t, F.concat(F.lit(AUX), attempt))
                .otherwise(t))
        if kind == "aux_try":
            body = t.substr(F.lit(2), F.length(t))
            return F.when(
                t.startswith(AUX),
                F.concat(F.lit(MARK), _sp_run(spec, stage[1], body)),
            ).otherwise(t)
        raise KeyError(kind)

    return fn


# Languages whose generated column expression is correct but too
# expensive for per-query Catalyst work: Turkish's staged chain
# measures ~92 s of py4j construction + analysis and an 11.5 MiB task
# binary per query; English's full-Porter chain ~4.4 s of Column
# construction + ~2.3 s of analysis per query against 0.7 s of actual
# execution (local[32], Spark 4.1).  For these the execution path is
# an Arrow-vectorized pandas_udf over the SAME pinned Python
# implementation with a worker-side token memo; the column-expr and
# DuckDB twins stay implemented and fuzz-pinned (test_snowball.py —
# en column in the regular agreement matrix, tr opt-in).
SLOW_EXPR_LANGS = {"tr", "en"}

_VEC_UDFS: dict = {}


def snowball_tokens_vec(tokens: Column, lang: str) -> Column:
    """array<string> -> stemmed array<string> via an Arrow-batched
    pandas_udf calling the reference Python backend (memoized — token
    frequencies are Zipfian, so the per-batch hit rate is high)."""
    if lang not in _VEC_UDFS:
        from functools import partial

        # explicit SCALAR form: the module-wide stringized annotations
        # can't be resolved by the type-hint inferrer for local
        # imports; partial over a module function pickles by reference
        # so the worker-side memo persists across Arrow batches
        _VEC_UDFS[lang] = F.pandas_udf(partial(_vec_stem_arrs, lang),
                                       "array<string>",
                                       F.PandasUDFType.SCALAR)
    return _VEC_UDFS[lang](tokens)


_WORKER_MEMO: dict = {}
_WORKER_MEMO_CAP = 1 << 20  # per-language; reset past this (leak guard)


def _vec_stem_arrs(lang, arrs):
    memo = _WORKER_MEMO.setdefault(lang, {})
    if len(memo) > _WORKER_MEMO_CAP:
        # web-scale vocabularies would otherwise grow the per-worker
        # dict unboundedly across queries; a periodic reset keeps the
        # Zipfian hot head re-cached within one batch
        memo.clear()

    def stem1(t):
        r = memo.get(t)
        if r is None:
            r = snowball_stem_py(t, lang)
            memo[t] = r
        return r

    return arrs.map(
        lambda a: None if a is None else [stem1(t) for t in a])


def snowball_tokens_expr(tokens: Column, lang: str) -> Column:
    """array<string> -> stemmed array<string>, pure JVM expressions
    (one F.transform pass per stage — big amongs appear once each).
    SLOW_EXPR_LANGS dispatch to the vectorized twin instead."""
    if lang in SLOW_EXPR_LANGS:
        return snowball_tokens_vec(tokens, lang)
    return snowball_tokens_col(tokens, lang)


def snowball_tokens_col(tokens: Column, lang: str) -> Column:
    """The pure column-expression backend for any language, including
    SLOW_EXPR_LANGS (tested opt-in — see test_snowball.py)."""
    spec = SNOWBALL_LANGS[lang]
    # the tr/en chains nest enough lambda levels (10+ stages plus
    # per-among lets) that the analyzer's fixed-point Resolution batch
    # needs more than its default 100 iterations. Scoped to
    # SLOW_EXPR_LANGS so ordinary languages don't carry a
    # session-global conf change as a side effect; the raise must
    # outlive this call (analysis happens at action time), which is
    # why it cannot be try/finally-restored.
    if lang in SLOW_EXPR_LANGS:
        try:
            from pyspark.sql import SparkSession
            sess = SparkSession.getActiveSession()
            if sess is not None:
                cur = int(sess.conf.get(
                    "spark.sql.analyzer.maxIterations", "100"))
                if cur < 1000:
                    sess.conf.set("spark.sql.analyzer.maxIterations",
                                  "1000")
        except Exception:
            pass
    out = tokens
    for stage in _stage_plan(lang):
        out = F.transform(out, _sp_stage(spec, stage))
    if spec.get("restore_empty"):
        out = F.zip_with(tokens, out,
                         lambda o, s: F.when(s == "", o).otherwise(s))
    return out


# --------------------------------------------------------------- duckdb

import itertools as _it

_sql_var = _it.count()


def _sql_let(val: str, body_fn) -> str:
    """Bind ``val`` once as a lambda variable (1-element
    list_transform) so big subexpressions aren't textually repeated."""
    var = f"lv{next(_sql_var)}"
    return f"list_transform([{val}], {var} -> {body_fn(var)})[1]"


def _sql_len(spec, v: str) -> str:
    fn = "strlen" if spec.get("units") == "bytes" else "length"
    return f"{fn}({v})"


def _sql_eff(v: str) -> str:
    """Stem part of a stashed token (v itself when no hold)."""
    return f"substr({v}, strpos({v}, '{SEP}') + 1)"


def _sql_region_len(spec, region, v: str) -> str:
    if region == "stash":
        return f"(length({v}) - strpos({v}, '{SEP}'))"
    n = _sql_len(spec,
                 f"regexp_extract({v}, '{_region_re(spec, region)}', 1)")
    if region == "r1" and spec["min_r1"]:
        n = f"least({n}, greatest({_sql_len(spec, v)} - {spec['min_r1']}, 0))"
    return n


def _sql_check_one(v: str, idx, chars, limit) -> str:
    neg = chars.startswith("!")
    cs = chars[1:] if neg else chars
    alts = " OR ".join(f"substr({v}, -{idx}, 1) = '{c}'" for c in cs)
    clause = f"(length({v}) >= {idx} AND ({alts}))"
    out = f"NOT {clause}" if neg else clause
    if limit is not None:
        # bounded test fails outright before the region start
        out = f"(({limit}) >= {idx} AND {out})"
    return out


def _sql_kind_check(spec, v: str, c, env=None) -> str:
    vw = spec["vowels"]
    kind = c[0]
    if env and kind in env:
        return env[kind]
    if kind == "inr":
        return f"({_sql_region_len(spec, c[1], v)}) >= {c[2]}"
    if kind == "r1len0":
        return f"({_sql_region_len(spec, 'r1', v)}) = 0"
    if kind == "vstem":
        stem = f"substr({v}, 1, length({v}) - {c[1]})" if c[1] else v
        return f"regexp_matches({stem}, '[{vw}]')"
    if kind in ("shortv", "not_shortv"):
        n = c[1]

        def at(k):
            return f"substr({v}, -{k}, 1)"

        ok = (f"(length({v}) >= {n + 3}"
              f" AND NOT regexp_matches({at(n + 1)}, '[{vw}wxY]')"
              f" AND regexp_matches({at(n + 2)}, '[{vw}]')"
              f" AND NOT regexp_matches({at(n + 3)}, '[{vw}]'))")
        return ok if kind == "shortv" else f"(NOT {ok})"
    if kind == "harmony":
        e = _sql_eff(v)
        pre = f"regexp_replace({e}, '[{vw}][^{vw}]*$', '')"
        v1 = f"regexp_extract({e}, '([{vw}])[^{vw}]*$', 1)"
        alts = " OR ".join(
            f"({v1} = '{vc}' AND regexp_matches({pre}, '[{allowed}]'))"
            for vc, allowed in spec["harmony"].items())
        return f"({alts})"
    if kind == "lastv":
        e = _sql_eff(v)
        v1 = f"regexp_extract({e}, '([{vw}])[^{vw}]*$', 1)"
        lst = ", ".join(f"'{ch}'" for ch in c[1])
        return f"({v1} IN ({lst}))"
    if kind == "cons":
        idx = c[1]
        return (f"({_sql_region_len(spec, 'stash', v)} >= {idx} "
                f"AND NOT regexp_matches("
                f"substr({v}, -{idx}, 1), '[{vw}]'))")
    if kind == "ne":
        lst = ", ".join(f"'{w}'" for w in c[1])
        return f"({v} NOT IN ({lst}))"
    raise KeyError(kind)


def _sql_check_elem(spec, v: str, c, limit, env=None) -> str:
    if c[0] == "or":
        groups = [
            "(" + " AND ".join(_sql_check_elem(spec, v, e, limit, env)
                               for e in g) + ")"
            for g in c[1:]
        ]
        return "(" + " OR ".join(groups) + ")"
    if isinstance(c[0], str):
        return _sql_kind_check(spec, v, c, env)
    return _sql_check_one(v, c[0], c[1], limit)


def _sql_checks(spec, v: str, checks, limit=None, env=None) -> str:
    parts = [_sql_check_elem(spec, v, c, limit, env) for c in checks]
    return " AND ".join(parts) if parts else "TRUE"


def _sql_action(v: str, suffix, action) -> str:
    if action[0] == "noop":
        return v
    if action[0] == "app":
        return f"({v} || '{action[1]}')"
    base = f"substr({v}, 1, length({v}) - {len(suffix)})"
    if action[0] == "repl":
        return f"({base} || '{action[1]}')"
    if action[0] == "repl_ext":
        cut = (f"substr({v}, 1, length({v}) - "
               f"{len(suffix) + action[1]})")
        return f"({cut} || '{action[2]}')"
    if action[0] == "del_u":
        dbl = (f"length({base}) >= 2 AND "
               f"substr({base}, -1) = substr({base}, -2, 1) AND "
               f"substr({base}, -1) IN ('k', 'd', 't')")
        return (f"(CASE WHEN {dbl} "
                f"THEN substr({base}, 1, length({base}) - 1) "
                f"ELSE {base} END)")
    if action[0] == "stash":
        return f"('{suffix}{SEP}' || {base})"
    return base  # del


def _sql_among(spec, region, rules, v: str, mode="limit") -> str:
    rlen = _sql_region_len(spec, region, v) if region \
        else _sql_len(spec, v)
    bounded = spec.get("checks_in_region") or mode.endswith("_cb")
    climit = rlen if bounded else None

    def body(env):
        whens = []
        for rule in _sorted_rules(rules):
            suffix, checks, action = rule[0], rule[1], rule[2]
            follow = rule[3] if len(rule) > 3 else None
            slen = _ulen(spec, suffix)
            matched = f"ends_with({v}, '{suffix}')" if suffix else "TRUE"
            if not mode.startswith("check"):
                matched += f" AND ({rlen}) >= {slen}"
            gate = _sql_checks(spec, v, checks, climit, env)
            if mode.startswith("check"):
                gate = f"({rlen}) >= {slen} AND {gate}"
            res = _sql_action(v, suffix, action)
            if follow is not None:
                res = _sql_run(spec, follow, f"({res})")
            whens.append(f"WHEN {matched} THEN (CASE WHEN {gate} "
                         f"THEN {res} ELSE {v} END)")
        return f"(CASE {' '.join(whens)} ELSE {v} END)"

    # bind the suffix-independent harmony scan once per among
    if any(("harmony",) in rule[1] for rule in rules):
        hcond = _sql_kind_check(spec, v, ("harmony",))
        return _sql_let(hcond, lambda h: body({"harmony": h}))
    return body(None)


def _sql_run(spec, prog, v: str) -> str:
    op = prog[0]
    if op == "among":
        mode = prog[3] if len(prog) > 3 else "limit"
        return _sql_among(spec, prog[1], prog[2], v, mode)
    if op == "undouble":
        region = prog[1]
        chars = prog[2] if len(prog) > 2 else None
        limit = _sql_region_len(spec, region, v) if region \
            else f"length({v})"
        if chars:
            memb = "substr({v}, -1) IN ({cs})".format(
                v=v, cs=", ".join(f"'{c}'" for c in chars))
        else:
            vv = "".join(spec["vowels"])
            memb = f"NOT regexp_matches(substr({v}, -1), '[{vv}]')"
        dbl = (f"({limit}) >= 1 AND length({v}) >= 2 AND "
               f"substr({v}, -1) = substr({v}, -2, 1) AND {memb}")
        return (f"(CASE WHEN {dbl} THEN substr({v}, 1, length({v}) - 1) "
                f"ELSE {v} END)")
    if op == "undouble_vtail":
        rlen = _sql_region_len(spec, prog[1], v) if prog[1] \
            else f"length({v})"
        vw = "".join(spec["vowels"])
        tail = f"regexp_extract({v}, '[{vw}]*$', 0)"
        k = f"(length({v}) - length({tail}))"
        c1 = f"substr({v}, {k}, 1)"
        c0 = f"substr({v}, {k} - 1, 1)"
        dbl = (f"{k} >= 2 AND {c1} = {c0} "
               f"AND ({rlen}) >= length({tail}) + 2")
        cut = f"(substr({v}, 1, {k} - 1) || {tail})"
        return f"(CASE WHEN {dbl} THEN {cut} ELSE {v} END)"
    if op == "seq":
        for p in prog[1]:
            v = _sql_run(spec, p, v)
        return v
    if op == "or":
        # sibling alternatives + first-change pick (see the Spark
        # twin): nested lets made the binder superlinear
        alts = ", ".join(_sql_run(spec, p, v) for p in prog[1])
        var = f"oa{next(_sql_var)}"
        return (f"coalesce(list_filter([{alts}], "
                f"{var} -> {var} != {v})[1], {v})")
    if op == "andseq":
        items = prog[1]

        def build(i, cur):
            if i >= len(items):
                return cur
            p, required = items[i]
            nxt = _sql_run(spec, p, cur)
            if required:
                return _sql_let(
                    nxt,
                    lambda n: f"(CASE WHEN {n} != {cur} "
                              f"THEN {build(i + 1, n)} "
                              f"ELSE chr(31) END)")
            return _sql_let(nxt, lambda n: build(i + 1, n))

        return _sql_let(
            build(0, v),
            lambda r: f"(CASE WHEN {r} = chr(31) THEN {v} ELSE {r} END)")
    if op == "ifchanged":
        attempt = _sql_run(spec, prog[1], v)
        then = _sql_run(spec, prog[2], f"({attempt})")
        return (f"(CASE WHEN ({attempt}) != {v} THEN {then} "
                f"ELSE {v} END)")
    if op == "setflag":
        return f"('{KIFLAG}' || {v})"
    if op == "guarded_setflag":
        attempt = _sql_run(spec, prog[1], v)
        return _sql_let(
            attempt,
            lambda a: f"(CASE WHEN {a} != {v} THEN '{KIFLAG}' || {v} "
                      f"ELSE {v} END)")
    if op == "dropheld":
        return f"(substr({v}, strpos({v}, '{SEP}') + 1))"
    raise KeyError(op)


def _sql_stage(spec, stage, v: str = "x") -> str:
    kind = stage[0]
    marked = f"starts_with({v}, '{MARK}')"
    auxed = f"starts_with({v}, '{AUX}')"
    flagged = f"starts_with({v}, '{FLAG}')"
    if kind == "strip":
        return f"CASE WHEN {marked} THEN substr({v}, 2) ELSE {v} END"
    if kind == "mark_short":
        return (f"CASE WHEN length({v}) <= {stage[1]} "
                f"THEN '{MARK}' || {v} ELSE {v} END")
    if kind == "mark_few_vowels":
        vw = spec["vowels"]
        nv = f"length(regexp_replace({v}, '[^{vw}]', '', 'g'))"
        return (f"CASE WHEN {nv} < {stage[1]} "
                f"THEN '{MARK}' || {v} ELSE {v} END")
    if kind == "flag_or":
        alts = []
        for p, raises in stage[1]:
            attempt = _sql_run(spec, p, v)
            pre = f"'{FLAG}' || " if raises else ""
            alts.append(_sql_let(
                attempt,
                lambda a, pre=pre: f"(CASE WHEN {a} != {v} "
                                   f"THEN {pre}{a} ELSE {v} END)"))
        var = f"oa{next(_sql_var)}"
        picked = (f"coalesce(list_filter([{', '.join(alts)}], "
                  f"{var} -> {var} != {v})[1], {v})")
        return f"CASE WHEN {marked} THEN {v} ELSE {picked} END"
    if kind == "unless_flag":
        return (f"CASE WHEN {marked} OR {flagged} THEN {v} "
                f"ELSE ({_sql_run(spec, stage[1], v)}) END")
    if kind == "if_kiflag":
        inner = _sql_let(f"substr({v}, 2)",
                         lambda b: _sql_run(spec, stage[1], b))
        return (f"CASE WHEN starts_with({v}, '{KIFLAG}') "
                f"THEN {inner} ELSE {v} END")
    if kind == "unstash":
        return _sql_let(
            f"strpos({v}, '{SEP}')",
            lambda i: f"(CASE WHEN {i} > 0 "
                      f"THEN substr({v}, {i} + 1) || "
                      f"substr({v}, 1, {i} - 1) ELSE {v} END)")
    if kind == "strip_all":
        return (f"CASE WHEN {marked} OR {flagged} "
                f"THEN substr({v}, 2) ELSE {v} END")
    if kind == "mark_scan":
        vow = ", ".join(f"'{c}'" for c in spec["vowels"])
        pairs = (f"list_transform(range(1, length({v}) + 1), "
                 f"i -> substr({v}, i::INT, 2))")
        whens = []
        for ch, needs in stage[1]:
            cond = (f"substr(p, 1, 1) = '{ch}' "
                    f"AND substr(acc, -1, 1) IN ({vow})")
            if needs:
                cond += f" AND substr(p, 2, 1) IN ({vow})"
            whens.append(f"WHEN {cond} THEN '{ch.upper()}'")
        case = f"CASE {' '.join(whens)} ELSE substr(p, 1, 1) END"
        return (f"list_reduce(list_prepend('', {pairs}), "
                f"(acc, p) -> acc || ({case}))")
    if kind == "tr":
        return f"translate({v}, '{stage[1]}', '{stage[2]}')"
    if kind == "re":
        out = v
        for pat, rep in stage[1]:
            out = (f"regexp_replace({out}, '{pat}', "
                   f"'{rep.replace('$', chr(92))}', 'g')")
        return out
    if kind == "flag_if_changed":
        body = f"(substr({v}, 2))"
        fed = _sql_run(spec, stage[1], body)
        attempt = _sql_run(spec, stage[1], v)
        return (f"CASE WHEN {flagged} THEN '{FLAG}' || ({fed}) "
                f"WHEN ({attempt}) != {v} "
                f"THEN '{FLAG}' || ({attempt}) ELSE {v} END")
    if kind == "branch_flag":
        body = f"(substr({v}, 2))"
        return (f"CASE WHEN {flagged} "
                f"THEN '{FLAG}' || ({_sql_run(spec, stage[1], body)}) "
                f"ELSE ({_sql_run(spec, stage[2], v)}) END")
    if kind == "strip_flag":
        return f"CASE WHEN {flagged} THEN substr({v}, 2) ELSE {v} END"
    if kind == "or_flag_second":
        a = _sql_run(spec, stage[1], v)
        b = _sql_run(spec, stage[2], v)
        return (f"CASE WHEN ({a}) != {v} THEN ({a}) "
                f"WHEN ({b}) != {v} THEN '{FLAG}' || ({b}) "
                f"ELSE {v} END")
    if kind == "plain":
        if spec.get("uses_flag"):
            body = f"(substr({v}, 2))"
            return (f"CASE WHEN {flagged} "
                    f"THEN '{FLAG}' || ({_sql_run(spec, stage[1], body)}) "
                    f"ELSE ({_sql_run(spec, stage[1], v)}) END")
        return _sql_run(spec, stage[1], v)
    if kind == "plain_unmarked":
        return (f"CASE WHEN {marked} THEN {v} "
                f"ELSE {_sql_run(spec, stage[1], v)} END")
    if kind == "alt":
        attempt = _sql_run(spec, stage[1], v)
        return (f"CASE WHEN {marked} OR {auxed} THEN {v} "
                f"WHEN ({attempt}) != {v} THEN '{MARK}' || ({attempt}) "
                f"ELSE {v} END")
    if kind == "alt_aux":
        attempt = _sql_run(spec, stage[1], v)
        return (f"CASE WHEN {marked} THEN {v} "
                f"WHEN ({attempt}) != {v} THEN '{AUX}' || ({attempt}) "
                f"ELSE {v} END")
    if kind == "aux_try":
        body = f"substr({v}, 2)"
        inner = _sql_run(spec, stage[1], f"({body})")
        return (f"CASE WHEN {auxed} THEN '{MARK}' || ({inner}) "
                f"ELSE {v} END")
    raise KeyError(kind)


def snowball_tokens_sql(list_expr: str, lang: str) -> str:
    """DuckDB twin over a VARCHAR[] expression."""
    spec = SNOWBALL_LANGS[lang]
    out = list_expr
    for stage in _stage_plan(lang):
        out = f"list_transform({out}, x -> {_sql_stage(spec, stage)})"
    if spec.get("restore_empty"):
        out = (f"list_transform(list_zip({list_expr}, {out}), "
               f"p -> CASE WHEN p[2] = '' THEN p[1] "
               f"ELSE p[2] END)")
    return out
