"""Snowball stemmers (da/no/sv/ru): hand-computed goldens from the
published algorithms (snowballstem.org) and 3-backend agreement on
suffix-rich fuzz vocabulary."""

import os
import random

import pytest

from dgraph_spark.functions.snowball import (
    snowball_stem_py,
    snowball_tokens_expr,
    snowball_tokens_sql,
)

DA_CASES = [
    ("bogen", "bog"), ("huset", "hus"), ("hestene", "hest"),
    # løst's region starts past the suffix: no action
    ("løst", "løst"),
    # step1 e, then step4 undouble
    ("hoppe", "hop"),
    # step1 e, then step3 els
    ("indtagelse", "indtag"),
    # R1 starts at the min-3 floor: region 'ens', longest suffix 'ens'
    ("hedens", "hed"),
]

NO_CASES = [
    ("huset", "hus"), ("bøkene", "bøk"), ("mannens", "mann"),
    # erte -> er replacement
    ("kasserte", "kasser"),
    # s after valid ending (r: valid)
    ("naboens", "nabo"),
    # s after vowel: NOT a valid s-ending -> s stays... 'hus': ends s,
    # preceded by u (vowel, not in list, k-rule needs k) -> unchanged
    ("huss", "huss"),
    # s after k NOT preceded by a vowel IS a valid s-ending — the
    # disjunctive branch of the valid-s-ending rule
    ("tanks", "tank"),
    # s after k preceded by a vowel: invalid, s stays
    ("raks", "raks"),
]

SV_CASES = [
    ("jakten", "jakt"), ("dagarnas", "dag"), ("flickorna", "flick"),
    ("stackars", "stackar"),  # s valid after r
    ("klokast", "klok"),
    # step3 fullt -> full needs R1 to cover it; here R1 starts at 3 so
    # only 'lt' is in region: unchanged
    ("fullt", "fullt"),
]

NL_CASES = [
    ("katten", "kat"),          # en + kk undouble
    ("bomen", "bom"),
    ("bossen", "boss"),         # only kk/dd/tt undouble — ss stays
    ("grote", "grot"),          # step 2 e
    ("gekken", "gek"),
    ("tabellen", "tabell"),
    # heid needs R2 (not R1) — pinned by the postgres snowball oracle
    ("waarheid", "waarheid"),
    ("mogelijkheid", "mogelijk"),
    # heden -> heid (R1), then 3a deletes heid
    ("mogelijkheden", "mogelijk"),
    ("lichamelijk", "licham"),  # lijk in R2, then rerun of step 2
    # bar deletes only when step 2 removed an e (e_found flag)
    ("onhoudbare", "onhoud"),
    ("onhoudbar", "onhoudbar"),
    ("vruchtbare", "vruchtbar"),  # bar matched but outside R2
    ("heden", "heden"),         # heden not in R1: among fails, no 'en'
    # i between vowels is marked I (a consonant): valid en-ending
    ("koeien", "koei"),
    ("ogen", "ogen"),           # en starts before R1 (min 3 letters)
]

FI_CASES = [
    ("taloihin", "talo"),       # hin with passing i-test, then step-5 i
    ("tolhin", "tolhin"),       # failed hXn test blocks the bare n
    ("atuhun", "atuhu"),        # hun is NOT an illative form
    ("toloiden", "tolo"),       # context entry re-emits the vowel
    ("toliiden", "toli"),       # ...and does NOT set the step-5 flag
    ("tolyiden", "tolyid"),     # y is not V1: falls through to n
    ("talooseen", "talo"),      # LV+seen, then 6a long-vowel trim
    ("tolitaan", "tol"),        # step-2 taan -> ta, step-3 ta, step-5 i
    ("tontta", "tont"),         # blocked tta, then 6b + 6e
    ("toletta", "tole"),        # tta with passing e-test
    ("tolenko", "tole"),        # particle ko after n, then step-3 n
    ("tolassti", "tolas"),      # sti in R2
    ("tolakseni", "tola"),      # ni, kse -> ksi, then step-3 ksi
    ("öjmoaitten", "öjmoa"),    # one among: cv rule must not refire
    ("eläkk", "eläk"),          # 6e undouble before trailing vowels
    ("aatonaatto", "aatonaato"),
    ("akk", "ak"),              # 6e is not region-limited
    ("euttta", "eutt"),
]

HU_CASES = [
    ("asztalok", "asztal"),     # plural ok
    ("házakban", "ház"),        # case ban, then plural ak
    ("könyvekkel", "könyv"),    # kel after kk double + undouble
    ("busszal", "busz"),        # instrumental al after doubled digraph
    ("meggyel", "megy"),        # ggy -> gy undouble
    ("iskolában", "iskol"),     # ban, á -> a, then owner a
    ("bán", "bá"),              # á before R1 stays accented
    ("aban", "aban"),           # blocked ban (starts before R1)
    ("pénzzé", "pénz"),         # factive é after double + undouble
    ("boldogságát", "boldogság"),
    ("házaim", "ház"),          # plural owner aim
    ("munkája", "munká"),       # owner ja — no á normalization
    ("munkánk", "munka"),       # ánk -> a
    ("tolberoké", "tolber"),    # owned oké
    ("tolberdoké", "tolber"),   # owned oké chains into owner d
    ("tolbáéé", "tolbá"),       # éé does NOT chain
    ("tolberáé", "tolbera"),    # é chains: á -> a
    ("tolberekam", "tolber"),   # owner am then plural ek
    ("tolberitok", "tolberit"), # itok is NOT an entry; plural ok
    ("naponként", "nap"),
]

RO_CASES = [
    ("copilul", "copil"),       # step 0 ul
    ("copilului", "copil"),
    ("casele", "cas"),          # ele -> e, then final-vowel e
    ("abilitate", "abil"),      # step 2 itate in R2
    ("activitate", "activ"),
    ("icitate", "icitat"),      # whole-word suffixes outside regions
    ("vorbesc", "vorb"),        # verb esc preceded (in RV) by consonant
    ("tonesc", "tonesc"),       # test char outside RV: among fails
    ("lucrează", "lucr"),
    ("mergeau", "merg"),
    ("gogaţia", "gog"),         # step 0 aţia -> aţi, then verb aţi (B)
    ("măinămut", "măinăm"),     # step 2 fired: verb step is GATED
    ("toberaţie", "tober"),     # step 0 does NOT gate the verb step
    ("turism", "turism"),       # ism not in R2
    ("artişti", "artişt"),      # işti blocked, step 4 i
    ("cărţile", "cărţ"),
    ("steaua", "steau"),        # u marked U between vowels
    ("dziea", "dzie"),          # ea is NOT a verb suffix (step 0 only)
    ("tonaseră", "tonaser"),    # theme entry aseră blocks bare seră
]

RU_CASES = [
    ("книгами", "книг"),       # noun ами
    ("важная", "важн"),        # adjective ая
    ("добрейший", "добр"),     # adjective ий + superlative ейш
    ("продолжавшихся", "продолжа"),  # reflexive + adjective + participle
    ("читавшие", "чита"),      # adjective ие + participle вш after а
    ("большое", "больш"),      # adjective ое
    ("спасибо", "спасиб"),     # noun о
    ("ночь", "ноч"),           # step-1 noun 'ь' in RV
    # gating 'а' lies BEFORE RV (RV = 'в'): perfective-gerund 'в'
    # must NOT fire — every Russian test runs inside setlimit RV
    ("тав", "тав"),
]


@pytest.mark.parametrize("word,want", DA_CASES)
def test_da_snowball(word, want):
    assert snowball_stem_py(word, "da") == want


@pytest.mark.parametrize("word,want", NO_CASES)
def test_no_snowball(word, want):
    assert snowball_stem_py(word, "no") == want


@pytest.mark.parametrize("word,want", SV_CASES)
def test_sv_snowball(word, want):
    assert snowball_stem_py(word, "sv") == want


@pytest.mark.parametrize("word,want", NL_CASES)
def test_nl_snowball(word, want):
    assert snowball_stem_py(word, "nl") == want


@pytest.mark.parametrize("word,want", FI_CASES)
def test_fi_snowball(word, want):
    assert snowball_stem_py(word, "fi") == want


@pytest.mark.parametrize("word,want", HU_CASES)
def test_hu_snowball(word, want):
    assert snowball_stem_py(word, "hu") == want


@pytest.mark.parametrize("word,want", RO_CASES)
def test_ro_snowball(word, want):
    assert snowball_stem_py(word, "ro") == want


@pytest.mark.parametrize("word,want", RU_CASES)
def test_ru_snowball(word, want):
    assert snowball_stem_py(word, "ru") == want


def _fuzz_vocab(lang, n=600, seed=29):
    rng = random.Random(seed)
    if lang == "en":
        sufs = ["", "s", "es", "sses", "ies", "ed", "ing", "eed", "y",
                "ly", "ally", "ility", "fulness", "ousness", "ization",
                "ational", "tional", "enci", "anci", "izer", "alli",
                "entli", "eli", "ousli", "ation", "ator", "alism",
                "iveness", "aliti", "iviti", "biliti", "icate",
                "ative", "alize", "iciti", "ical", "ful", "ness",
                "al", "ance", "ence", "er", "ic", "able", "ible",
                "ant", "ement", "ment", "ent", "sion", "tion", "ou",
                "ism", "ate", "iti", "ous", "ive", "ize", "e", "l",
                "ll", "yed", "ying", "at", "bl", "iz", "logi", "bli"]
        return sorted({
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                    for _ in range(rng.randint(1, 8)))
            + rng.choice(sufs) for _ in range(n)})
    if lang == "nl":
        alphabet = "abcdefghijklmnopqrstuvwyzè"
        sufs = ["", "heden", "ene", "en", "se", "s", "e", "heid",
                "end", "ing", "ig", "lijk", "baar", "bar", "kken",
                "dden", "tten", "gemen", "aars", "iy", "yi", "aa",
                "ied", "aat", "ië", "tje"]
        rng = random.Random(seed)
        return sorted({
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            + rng.choice(sufs) for _ in range(n)})
    if lang == "fi":
        alphabet = "adehijklmnoprstuvyäö"
        sufs = ["", "kin", "kaan", "kään", "ko", "kö", "han", "hän",
                "pa", "pä", "sti", "si", "ni", "nsa", "nsä", "mme",
                "nne", "taan", "ssaan", "llaan", "naan", "tään",
                "lleen", "ineen", "ahan", "ihin", "ohon", "uhun",
                "yhyn", "oiden", "aitten", "eisiin", "ooseen", "siin",
                "den", "tten", "seen", "a", "ä", "tta", "ttä", "etta",
                "ta", "tä", "ssa", "ssä", "sta", "stä", "lla", "llä",
                "lta", "ltä", "lle", "na", "nä", "ksi", "ine", "n",
                "an", "en", "in", "mpi", "immi", "imma", "eja", "i",
                "j", "t", "at", "it", "kaa", "kk", "tt", "kko", "ttu",
                "aa", "ee", "oj", "uj", "jo", "ja", "ia", "ien",
                "iin", "isompi", "itaan", "iden", "ttta", "iiden"]
        rng = random.Random(seed)
        return sorted({
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            + rng.choice(sufs) for _ in range(n)})
    if lang == "hu":
        alphabet = "abcdefghijklmnoprstuvzáéíóöúü"
        sufs = ["", "ban", "ben", "ra", "nak", "val", "tól", "ból",
                "hoz", "nál", "ig", "at", "ot", "ért", "képpen", "kor",
                "ul", "vá", "onként", "ként", "en", "on", "n", "t",
                "án", "ánként", "al", "el", "ttal", "kkel", "sszal",
                "ggyel", "á", "é", "zzé", "áéi", "éé", "éi", "ké",
                "aké", "oké", "unk", "nk", "ánk", "juk", "uk", "em",
                "om", "m", "ám", "od", "d", "ád", "ja", "je", "a",
                "e", "o", "jaim", "aim", "im", "áim", "aid", "id",
                "jai", "ai", "i", "ái", "aink", "ink", "eitek",
                "itek", "aik", "ik", "ák", "ék", "ok", "ek", "k",
                "jáké", "doké", "ekam"]
        rng = random.Random(seed)
        return sorted({
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            + rng.choice(sufs) for _ in range(n)})
    if lang == "ro":
        alphabet = "abcdefghijlmnoprstuvzăâîşţ"
        sufs = ["", "ul", "ului", "aua", "ea", "ele", "elor", "ii",
                "iua", "iei", "iile", "ilor", "ile", "atei", "aţie",
                "aţia", "abilitate", "ivitate", "icitate", "icală",
                "aţiune", "ătoare", "iţiune", "at", "ată", "ice",
                "abilă", "oasă", "oşi", "ităţi", "ţiune", "iune",
                "ism", "işti", "are", "ire", "ându", "ează", "ească",
                "esc", "eşti", "ăşte", "eam", "iau", "aşi", "arăm",
                "iseră", "useră", "userăm", "urăţi", "sese", "sesem",
                "seserăţi", "em", "eţi", "iţi", "âm", "ăm", "sei",
                "se", "a", "e", "i", "ie", "ă", "ui", "aţi", "uia"]
        rng = random.Random(seed)
        return sorted({
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            + rng.choice(sufs) for _ in range(n)})
    if lang == "tr":
        alphabet = "abcçdefgğhıijklmnoöprsştuüvyz"
        sufs = ["", "ki", "deki", "daki", "teki", "ndeki", "kinde",
                "kinin", "kiler", "ler", "lar", "i", "ı", "u", "ü",
                "si", "sı", "in", "ın", "nin", "nın", "de", "da",
                "nda", "nde", "leri", "ları", "im", "ım", "imiz",
                "ımız", "ine", "ına", "den", "ndan", "le", "la",
                "yle", "nca", "ce", "m", "n", "mız", "ya", "e", "yı",
                "mış", "dı", "du", "tı", "ysa", "ken", "sın", "dır",
                "casına", "lardır", "larında", "dakilerin", "b", "d",
                "g", "ğ", "ud"]
        rng = random.Random(seed)
        return sorted({
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            + rng.choice(sufs) + rng.choice(sufs) for _ in range(n)})
    if lang == "ru":
        alphabet = "абвгдежзиклмнопрстуфхцчшщыьэюя"
        sufs = ["", "в", "вши", "вшись", "ив", "ывшись", "ся", "сь",
                "ими", "ее", "ой", "его", "ая", "ую", "нн", "ейш",
                "ейше", "ость", "ост", "и", "ь", "ла", "на", "ете",
                "йте", "или", "ует", "уют", "ены", "ить", "ишь", "ями",
                "иями", "ах", "ию", "ия", "а", "е", "о", "у", "ы", "ю"]
    else:
        alphabet = "abcdefghijklmnopqrstuvwxyzæøåäö"
        sufs = ["", "s", "es", "en", "et", "e", "ere", "erne", "endes",
                "heden", "hedens", "igst", "elig", "lig", "els", "ig",
                "løst", "gd", "dt", "gt", "kt", "erte", "ert", "ande",
                "hetene", "hetenes", "slov", "leg", "eig", "arna",
                "heterna", "ornas", "aste", "anden", "fullt", "löst",
                "nn", "tt", "dd", "ast", "het"]
    return sorted({
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
        + rng.choice(sufs) for _ in range(n)})


def test_pinned_snowball_vectors():
    """~700 words per language pinned from the REAL Snowball
    implementation (postgres 15's dict_snowball, the same generated
    C as bleve's Go port — byte-cursor semantics included). Generated
    once via ts_lexize; regenerate with tools documented in
    .claude/skills/verify/SKILL.md if specs change."""
    import json
    import pathlib

    vecs = json.loads(
        (pathlib.Path(__file__).parent / "golden"
         / "snowball_vectors.json").read_text())
    for lang, pairs in vecs.items():
        bad = {w: (snowball_stem_py(w, lang), want)
               for w, want in pairs.items()
               if snowball_stem_py(w, lang) != want}
        assert not bad, (lang, dict(list(bad.items())[:5]))


def test_porter_departures():
    """porter.c's documented departures from the published paper (and
    from PG's paper-faithful snowball 'porter'): step-2 bli->ble and
    logi->log, the length<=2 guard, and doublec() undoubling ANY
    double consonant but l/s/z where porter.sbl lists only
    bb/dd/ff/gg/mm/nn/pp/rr/tt. The reference runs porter.c semantics
    (blevesearch/go-porterstemmer via tok/stemmers.go:37), so the
    shipped EN_SPEC pins these by hand while EN_SPEC_PG (the fuzz twin
    diffed to 0 against ts_lexize('porter', ...)) keeps paper rules."""
    from dgraph_spark.functions.snowball import EN_SPEC_PG, _py_stages

    cc = {"terribly": "terribl", "possibly": "possibl",
          "technology": "technolog", "psychology": "psycholog",
          "nobly": "nobli",          # m("no")=0 blocks bli->ble
          "geology": "geologi",      # m("geo")=0 blocks logi->log
          "as": "as", "is": "is", "ss": "ss",
          "trekked": "trek", "trekking": "trek"}
    for w, want in cc.items():
        assert snowball_stem_py(w, "en") == want, (w, want)
    pg = {"terribly": "terribli", "possibly": "possibli",
          "technology": "technologi", "as": "a",
          "trekked": "trekk", "trekking": "trekk"}
    for w, want in pg.items():
        assert _py_stages(EN_SPEC_PG, EN_SPEC_PG["stages"], w) == want


@pytest.mark.parametrize("lang", [
    "da", "no", "sv", "ru", "nl",
    pytest.param("ro", marks=pytest.mark.slow), "fi",
    pytest.param("hu", marks=pytest.mark.slow), "en", "tr"])
def test_three_backend_agreement(spark, lang):
    import duckdb
    import pyspark.sql.functions as F

    vocab = _fuzz_vocab(lang)
    py_out = [snowball_stem_py(w, lang) for w in vocab]

    vals = ", ".join("'" + w + "'" for w in vocab)
    sql_out = duckdb.connect().execute(
        "SELECT " + snowball_tokens_sql(f"[{vals}]", lang)).fetchone()[0]
    assert sql_out == py_out

    # for SLOW_EXPR_LANGS (tr/en) this is the vectorized execution
    # path; the pure column expression is additionally checked for en
    # here (cheap) and for tr by the opt-in test below (~2 min)
    df = spark.createDataFrame([(vocab,)], "toks array<string>")
    sp_out = df.select(
        snowball_tokens_expr(F.col("toks"), lang).alias("o")
    ).collect()[0]["o"]
    assert sp_out == py_out
    if lang == "en":
        from dgraph_spark.functions.snowball import snowball_tokens_col
        col_out = df.select(
            snowball_tokens_col(F.col("toks"), lang).alias("o")
        ).collect()[0]["o"]
        assert col_out == py_out


@pytest.mark.skipif(not os.environ.get("DGSPARK_SLOW_TESTS"),
                    reason="tr column-expr analysis takes ~2 min in "
                           "Catalyst; run with DGSPARK_SLOW_TESTS=1")
def test_tr_column_expr_backend(spark):
    """The pure-Catalyst Turkish backend agrees with the Python
    reference (execution normally routes tr through the vectorized
    pandas_udf — see snowball.SLOW_EXPR_LANGS)."""
    import pyspark.sql.functions as F

    from dgraph_spark.functions.snowball import snowball_tokens_col

    vocab = _fuzz_vocab("tr", n=300)
    py_out = [snowball_stem_py(w, "tr") for w in vocab]
    df = spark.createDataFrame([(vocab,)], "toks array<string>")
    sp_out = df.select(
        snowball_tokens_col(F.col("toks"), "tr").alias("o")
    ).collect()[0]["o"]
    assert sp_out == py_out
