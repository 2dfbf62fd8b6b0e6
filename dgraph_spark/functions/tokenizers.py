"""Tokenizers as column expressions (reference: tok/tok.go).

All hot-path tokenizers are pure Catalyst expressions (split/lower/
transform/filter) so term/fulltext search stays inside whole-stage
codegen — the Spark equivalent of dgraph's index tokenization, done at
scan time instead of write time. No Python UDFs here.

- term  (tok/tok.go:369-389): unicode-word split + lowercase.
- fulltext (tok/tok.go:558-575): term + stopwords + stemming. en runs
  the full Porter algorithm (porter.c semantics, functions/snowball.py
  EN_SPEC); de/es/fr/it/pt run the reference's Lucene light stemmers
  (functions/light_stemmers.py), da/no/sv/ru/nl/ro/fi/hu/tr the
  published Snowball algorithms (functions/snowball.py; tr executes
  through a vectorized twin of the same pinned spec — see
  snowball.SLOW_EXPR_LANGS), ar/ckb/hi the Lucene Arabic/Sorani/Hindi
  stemmers bleve ports (functions/dedicated_stemmers.py), zh/ja/ko the
  cjk_bigram filter — matching tok/stemmers.go langStemmers routing.
  All 21 routed languages now match the reference's algorithms.
- trigram (tok/tok.go:616): dgraph uses trigrams only as a lossy regex
  prefilter — Spark evaluates regexes exactly, so trigram is exposed for
  parity/tests but not needed for correctness (SURVEY.md §4).
- ngram (tok/tok.go:447-551).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Matches dgraph's term tokenizer: split on non-letter/digit, lowercase.
# \p{M} keeps combining marks (Devanagari matras, Arabic diacritics)
# attached to their word — bleve's UAX#29 unicode tokenizer never
# breaks a word at a combining mark.
TERM_SPLIT_RE = r"[^\p{L}\p{M}\p{N}]+"

# Minimal English stopword list (subset of bleve's en stopwords,
# tok/stopwords.go) — applied in fulltext mode.
EN_STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with",
]


def term_tokens(col: Column) -> Column:
    """array<string> of lowercase word tokens; empty strings removed."""
    return F.filter(F.split(F.lower(col), TERM_SPLIT_RE), lambda t: t != "")


# ---- multi-language fulltext (tok/stemmers.go, tok/stopwords.go ship
# bleve snowball stemmers + stopword sets per language; here: the same
# shape as the EN analyzer — stopwords + a table-driven suffix-stripper
# ("snowball-lite") — so every language stays a pure column expression
# AND generates its own DuckDB oracle twin from the same tables).

DE_STOPWORDS = [
    "der", "die", "das", "und", "oder", "nicht", "ein", "eine", "einer",
    "eines", "einem", "einen", "dem", "den", "des", "ist", "sind", "war",
    "waren", "wird", "werden", "mit", "von", "zu", "im", "in", "auf",
    "fur", "für", "als", "auch", "an", "bei", "nach", "aus", "es", "sie", "er",
]
FR_STOPWORDS = [
    "le", "la", "les", "un", "une", "des", "du", "de", "et", "ou", "est",
    "sont", "etait", "a", "au", "aux", "pour", "par", "avec", "sans",
    "sur", "dans", "ce", "cette", "ces", "que", "qui", "ne", "pas", "plus",
    "en", "se", "il", "elle", "nous", "vous",
]
ES_STOPWORDS = [
    "el", "la", "los", "las", "un", "una", "unos", "unas", "y", "o", "de",
    "del", "que", "en", "es", "son", "fue", "para", "por", "con", "sin",
    "sobre", "este", "esta", "estos", "estas", "no", "mas", "se", "su",
    "al", "lo", "como", "pero",
]

RU_STOPWORDS = [
    "и", "в", "во", "не", "что", "он", "на", "я", "с", "со", "как", "а",
    "то", "все", "она", "так", "его", "но", "да", "ты", "к", "у", "же",
    "вы", "за", "бы", "по", "ее", "мне", "было", "вот", "от", "о", "из",
    "ему", "еще", "нет", "или", "это", "для", "при", "об",
]
IT_STOPWORDS = [
    "il", "lo", "la", "i", "gli", "le", "un", "uno", "una", "di", "del",
    "della", "dei", "delle", "che", "e", "ed", "o", "in", "su", "per",
    "con", "non", "si", "da", "al", "alla", "ai", "come", "ma", "anche",
    "piu", "più", "questo", "questa", "sono", "essere", "ha", "hanno",
]
PT_STOPWORDS = [
    "o", "a", "os", "as", "um", "uma", "uns", "umas", "de", "do", "da",
    "dos", "das", "que", "e", "ou", "em", "no", "na", "nos", "nas", "por",
    "para", "com", "sem", "nao", "não", "se", "mais", "como", "mas", "ao",
    "aos", "ser", "foi", "sao", "são", "tem", "seu", "sua",
]

# (suffixes longest-first, minimum remaining stem length)
DE_SUFFIXES = (["ungen", "ung", "ern", "em", "en", "er", "es", "e", "s"], 4)
FR_SUFFIXES = (["ations", "ation", "ements", "ement", "euses", "euse",
                "ees", "ee", "es", "er", "e", "s"], 4)
ES_SUFFIXES = (["aciones", "acion", "amientos", "amiento", "mente",
                "idades", "idad", "os", "as", "es", "o", "a", "e"], 4)
RU_SUFFIXES = (["иями", "ями", "ами", "ости", "ость", "иях", "иям", "ием",
                "ого", "его", "ому", "ему", "ыми", "ими", "ешь", "ишь",
                "ует", "уют", "ать", "ять", "ить", "еть", "ал", "ял", "ил",
                "ел", "ии", "ие", "ия", "ий", "ый", "ой", "ая", "яя", "ую",
                "юю", "ых", "их", "ым", "им", "ом", "ем", "ам", "ям", "ах",
                "ях", "ов", "ев", "ей", "ью", "ет", "ют", "ит", "ат", "ят",
                "а", "я", "ы", "и", "о", "у", "ю", "е", "ь"], 3)
IT_SUFFIXES = (["azioni", "azione", "amenti", "amento", "mente", "ita",
                "ari", "are", "ere", "ire", "ato", "ata", "ati", "ate",
                "uto", "uta", "uti", "ute", "i", "o", "a", "e"], 3)
PT_SUFFIXES = (["acoes", "acao", "amentos", "amento", "mente", "idades",
                "idade", "eiro", "eira", "oso", "osa", "ar", "er", "ir",
                "os", "as", "es", "o", "a", "e"], 3)

# -- remaining languages (nl, fi, hu, ro, tr — da/no/sv/ru upgraded to
# real Snowball in functions/snowball.py), snowball-lite shape: public
# snowball stopword lists (abridged to the high-frequency head) + light
# longest-first suffix strippers. The da/no/sv/ru suffix tables below
# remain only as stopword sources.
DA_STOPWORDS = [
    "og", "i", "jeg", "det", "at", "en", "den", "til", "er", "som", "pa",
    "på", "de", "med", "han", "af", "for", "ikke", "der", "var", "mig",
    "sig", "men", "et", "har", "om", "vi", "min", "havde", "ham", "hun",
    "nu", "over", "da", "fra", "du", "ud", "sin", "dem", "os", "op", "man",
]
DA_SUFFIXES = (["erendes", "erende", "hedens", "heden", "heder", "endes",
                "ernes", "erens", "ered", "ende", "erne", "eren", "erer",
                "eres", "eret", "hed", "ene", "ens", "ere", "ers", "ets",
                "en", "er", "es", "et", "e", "s"], 3)
NL_STOPWORDS = [
    "de", "en", "van", "ik", "te", "dat", "die", "in", "een", "hij", "het",
    "niet", "zijn", "is", "was", "op", "aan", "met", "als", "voor", "had",
    "er", "maar", "om", "hem", "dan", "zou", "of", "wat", "mijn", "men",
    "dit", "zo", "door", "over", "ze", "zich", "bij", "ook", "tot", "je",
    "mij", "uit", "der", "daar", "haar", "naar", "heb", "hoe", "heeft",
    "hebben", "deze", "want", "nog", "zal", "me", "zij", "nu", "geen",
]
NL_SUFFIXES = (["heden", "ingen", "ing", "ende", "den", "en", "er",
                "e", "s"], 3)
FI_STOPWORDS = [
    "ja", "on", "se", "ei", "etta", "että", "oli", "han", "hän", "mutta",
    "niin", "kuin", "kun", "mina", "minä", "sina", "sinä", "me", "te",
    "he", "tama", "tämä", "tuo", "joka", "mika", "mikä", "myos", "myös",
    "sen", "sita", "sitä", "ovat", "ole", "olla", "siina", "jos", "vain",
    "nyt", "jo",
]
FI_SUFFIXES = (["issa", "issä", "ista", "istä", "illa", "illä", "ilta",
                "iltä", "ille", "inen", "isen", "iden", "ien", "ssa",
                "ssä", "sta", "stä", "lla", "llä", "lta", "ltä", "lle",
                "ksi", "tta", "ttä", "nsa", "nsä", "an", "än", "en", "in",
                "at", "ät", "a", "ä", "t", "n"], 3)
HU_STOPWORDS = [
    "a", "az", "es", "és", "hogy", "nem", "is", "de", "egy", "ez", "volt",
    "van", "meg", "csak", "mint", "mar", "már", "el", "ki", "meg", "még",
    "vagy", "ha", "mi", "azt", "be", "fel", "le", "arra", "ezek", "ezt",
]
HU_SUFFIXES = (["okkal", "ekkel", "akkal", "ban", "ben", "nak", "nek",
                "val", "vel", "tol", "től", "bol", "ből", "rol", "ről",
                "hoz", "hez", "höz", "nal", "nél", "ra", "re", "ba", "be",
                "on", "en", "ön", "ok", "ek", "ak", "at", "et", "ot",
                "öt", "t", "k", "n", "i"], 3)
NO_STOPWORDS = [
    "og", "i", "jeg", "det", "at", "en", "et", "den", "til", "er", "som",
    "pa", "på", "de", "med", "han", "av", "ikke", "der", "sa", "så", "var",
    "meg", "seg", "men", "ett", "har", "om", "vi", "min", "mitt", "ha",
    "hadde", "hun", "na", "nå", "over", "da", "ved", "fra", "du", "ut",
    "sin", "dem", "oss", "opp", "man", "kan", "hans", "hvor", "eller",
    "hva", "skal", "selv", "her", "alle", "vil", "bli", "ble", "etter",
]
NO_SUFFIXES = (["hetenes", "hetens", "hetene", "heter", "heten", "endes",
                "ande", "ende", "edes", "enes", "erte", "het", "ast",
                "ert", "ede", "ane", "ene", "ens", "ers", "ets", "en",
                "ar", "er", "as", "es", "et", "a", "e", "s"], 3)
RO_STOPWORDS = [
    "si", "și", "in", "în", "a", "ca", "pe", "la", "de", "cu", "un", "o",
    "este", "sunt", "care", "nu", "se", "mai", "din", "al", "ai", "ale",
    "lui", "ei", "noi", "voi", "dar", "sau", "daca", "dacă", "cand",
    "când", "pentru", "dupa", "după", "fara", "fără", "ce", "cel", "cea",
]
RO_SUFFIXES = (["iilor", "ilor", "ului", "elor", "atie", "ație", "eaza",
                "ează", "uri", "ele", "ate", "ata", "ată", "ii", "ul",
                "ei", "le", "ea", "at", "a", "e", "i"], 3)
SV_STOPWORDS = [
    "och", "det", "att", "i", "en", "jag", "hon", "som", "han", "pa",
    "på", "den", "med", "var", "sig", "for", "för", "sa", "så", "till",
    "ar", "är", "men", "ett", "om", "hade", "de", "av", "icke", "mig",
    "du", "henne", "da", "då", "sin", "nu", "har", "inte", "hans",
    "honom", "skulle", "hennes", "dar", "där", "min", "man", "ej", "vid",
    "kunde", "nagot", "något", "fran", "från", "ut", "nar", "när",
    "efter", "upp", "vi", "dem", "vara", "vad", "over", "över", "an",
    "än", "dig", "kan", "sina", "har", "här", "ha", "mot", "alla",
    "under", "nagon", "någon", "eller", "allt", "mycket",
]
SV_SUFFIXES = (["heterna", "hetens", "heter", "heten", "andet", "arnas",
                "ernas", "ornas", "ande", "arne", "aste", "orna", "ade",
                "are", "ern", "ens", "ast", "at", "ad", "en", "ar", "er",
                "or", "as", "es", "a", "e", "s"], 3)
TR_STOPWORDS = [
    "ve", "bir", "bu", "da", "de", "icin", "için", "ile", "mi", "mu",
    "ama", "ki", "ne", "o", "cok", "çok", "daha", "en", "gibi", "kadar",
    "sonra", "ancak", "artik", "artık", "butun", "bütün", "her", "hic",
    "hiç", "ise", "iste", "işte", "kendi", "nasil", "nasıl", "neden",
    "niye", "sey", "şey", "uzere", "üzere", "yani", "ya", "hem", "ona",
]
TR_SUFFIXES = (["larindan", "lerinden", "larinda", "lerinde", "lari",
                "leri", "larin", "lerin", "larda", "lerde", "dan", "den",
                "tan", "ten", "lar", "ler", "nin", "nun", "nün", "nın",
                "da", "de", "ta", "te", "in", "un", "ün", "ın", "i", "u",
                "ü", "ı", "a", "e"], 3)

# Stopword lists for the dedicated-stemmer languages (curated subsets
# of bleve's lang token maps, like the lists above; these scripts have
# no accent folding). Suffix tables are empty — stemming is handled by
# functions/dedicated_stemmers.py.
AR_STOPWORDS = [
    "من", "في", "على", "إلى", "الى", "عن", "أن", "ان", "إن", "كان",
    "مع", "هذا", "هذه", "ذلك", "التي", "الذي", "ما", "لا", "لم", "لن",
    "قد", "كل", "بعد", "قبل", "عند", "لقد", "و", "أو", "او", "ثم",
    "بل", "حتى", "إذا", "اذا", "كما", "لكن", "منذ", "غير", "بين",
    "أي", "اي", "هو", "هي", "هم", "أنا", "انا", "نحن", "أنت", "انت",
    "كيف", "أين", "اين", "متى", "ليس", "فيه", "منها", "منه", "عليه",
    "إليه", "اليه", "إلا", "الا", "فقط", "هناك", "يكون", "تكون",
    "وكان", "قال", "وقال", "به", "له", "لها", "لهم", "فيها", "عليها",
]
CKB_STOPWORDS = [
    "و", "لە", "بە", "بۆ", "کە", "ئەو", "ئەم", "لەگەڵ", "وە", "جا",
    "هەر", "دە", "تا", "یان", "ئەوە", "ئەمە", "بەڵام", "چی", "کێ",
    "بوو", "نە", "هیچ", "دوو", "ئێمە", "ئێوە", "ئەوان", "من", "تۆ",
    "لەسەر", "پاش", "پێش", "ژێر", "بەر", "ناو", "بێ", "کرد", "هەیە",
    "نییە", "دەبێت", "وەک", "ئەگەر", "چونکە", "یەک", "دیکە", "هەموو",
]
HI_STOPWORDS = [
    "के", "का", "की", "को", "में", "है", "हैं", "और", "से", "पर",
    "यह", "वह", "इस", "उस", "एक", "हो", "था", "थी", "थे", "ही",
    "भी", "तो", "ने", "कि", "जो", "अपने", "लिए", "नहीं", "कुछ",
    "अब", "जब", "तक", "साथ", "बाद", "या", "हम", "आप", "वे", "कर",
    "किया", "गया", "रहा", "रही", "रहे", "करने", "वाले", "सकता",
    "होता", "बहुत", "कई", "दो", "सभी", "इन", "उन", "इसके", "उनके",
    "होने", "करते", "बन", "इसी", "कोई", "मगर", "फिर", "तरह",
]
AR_SUFFIXES = ([], 0)
CKB_SUFFIXES = ([], 0)
HI_SUFFIXES = ([], 0)

# accent folding per language (1:1 translate table + ß handled apart)
_FOLD = {
    "de": ("äöü", "aou"),
    "fr": ("àâäèéêëîïôöûüùç", "aaaeeeeiioouuuc"),
    "es": ("áéíóúüñ", "aeiouun"),
    "ru": ("ё", "е"),
    "it": ("àèéìòóù", "aeeioou"),
    "pt": ("áâãàçéêíóôõú", "aaaaceeiooou"),
    "da": ("æøå", "aoa"),
    "nl": ("éëïö", "eeio"),
    "fi": ("äöå", "aoa"),
    "hu": ("áéíóöőúüű", "aeiooouuu"),
    "no": ("æøå", "aoa"),
    "ro": ("ăâîșşțţ", "aaisstt"),
    "sv": ("åäö", "aao"),
    "tr": ("çğıöşü", "cgiosu"),
}

_LANG_TABLES = {
    "de": (DE_STOPWORDS, DE_SUFFIXES),
    "fr": (FR_STOPWORDS, FR_SUFFIXES),
    "es": (ES_STOPWORDS, ES_SUFFIXES),
    "ru": (RU_STOPWORDS, RU_SUFFIXES),
    "it": (IT_STOPWORDS, IT_SUFFIXES),
    "pt": (PT_STOPWORDS, PT_SUFFIXES),
    "da": (DA_STOPWORDS, DA_SUFFIXES),
    "nl": (NL_STOPWORDS, NL_SUFFIXES),
    "fi": (FI_STOPWORDS, FI_SUFFIXES),
    "hu": (HU_STOPWORDS, HU_SUFFIXES),
    "no": (NO_STOPWORDS, NO_SUFFIXES),
    "ro": (RO_STOPWORDS, RO_SUFFIXES),
    "sv": (SV_STOPWORDS, SV_SUFFIXES),
    "tr": (TR_STOPWORDS, TR_SUFFIXES),
    "ar": (AR_STOPWORDS, AR_SUFFIXES),
    "ckb": (CKB_STOPWORDS, CKB_SUFFIXES),
    "hi": (HI_STOPWORDS, HI_SUFFIXES),
}

# CJK: no stemmer/stopwords — unicode segmentation yields one token per
# CJK character (Han / kana / hangul) plus latin/digit runs
# (tok/stemmers.go routes zh/ja/ko to cjk_bigram; divergence: per-char
# tokens instead of overlapping bigrams, applied identically to both
# the indexed text and the query so matching is consistent)
# RUNS of CJK chars (bigrammed below) or latin/digit tokens — the
# reference's cjk_bigram filter emits OVERLAPPING bigrams per CJK run,
# unigrams only for isolated single chars (tok/stemmers.go routes
# zh/ja/ko -> cjk_bigram; bleve analysis/token/cjk)
_CJK_RUNS_RE = (r"[\p{IsHan}\p{IsHiragana}\p{IsKatakana}\p{IsHangul}]+"
                r"|[a-z0-9]+")
_CJK_RUNS_RE_RE2 = (r"(\p{Han}|\p{Hiragana}|\p{Katakana}|\p{Hangul})+"
                    r"|[a-z0-9]+")  # DuckDB / RE2 spelling
_CJK_RUNS_RE_PY = (r"[㐀-鿿豈-﫿ぁ-ゟ゠-ヿ가-힯ᄀ-ᇿ]+"
                   r"|[a-z0-9]+")
_CJK_LANGS = {"zh", "ja", "ko"}


def _cjk_bigrams_py(text: str) -> list[str]:
    import re as _re

    out: list[str] = []
    for run in _re.findall(_CJK_RUNS_RE_PY, text.lower()):
        if run[0].isascii() or len(run) == 1:
            out.append(run)
        else:
            out.extend(run[i:i + 2] for i in range(len(run) - 1))
    return out


def _fold_expr(col: Column, lang: str) -> Column:
    src, dst = _FOLD[lang]
    out = F.translate(col, src, dst)
    if lang == "de":
        out = F.regexp_replace(out, "ß", "ss")
    return out


def _fold_py(s: str, lang: str) -> str:
    src, dst = _FOLD[lang]
    s = s.translate(str.maketrans(src, dst))
    return s.replace("ß", "ss") if lang == "de" else s


def _suffix_stem_expr(t: Column, suffixes: list[str], min_stem: int) -> Column:
    expr = None
    for suf in suffixes:
        c = (F.length(t) - len(suf) >= min_stem) & t.endswith(suf)
        stripped = t.substr(F.lit(1), F.length(t) - len(suf))
        expr = F.when(c, stripped) if expr is None else expr.when(c, stripped)
    return expr.otherwise(t)


def _suffix_stem_py(t: str, suffixes: list[str], min_stem: int) -> str:
    for suf in suffixes:
        if t.endswith(suf) and len(t) - len(suf) >= min_stem:
            return t[: -len(suf)]
    return t


def stem_lang_py(tok: str, lang: str) -> str:
    """Python twin of the per-language analyzer for query-side literals."""
    from dgraph_spark.functions.light_stemmers import (LIGHT_STEM_LANGS,
                                                       light_stem_py)

    if lang in LIGHT_STEM_LANGS:
        # de/es/fr/it/pt use the reference's light stemmers
        # (tok/stemmers.go stemmer_{lang}_light) on UNFOLDED tokens
        return light_stem_py(tok, lang)
    from dgraph_spark.functions.snowball import (SNOWBALL_LANGS,
                                                 snowball_stem_py)
    if lang in SNOWBALL_LANGS:
        if lang == "ru":
            tok = tok.replace("ё", "е")
        return snowball_stem_py(tok, lang)
    from dgraph_spark.functions.dedicated_stemmers import (
        DEDICATED_STEM_LANGS, dedicated_stem_py)
    if lang in DEDICATED_STEM_LANGS:
        return dedicated_stem_py(tok, lang)
    if lang in _LANG_TABLES:
        sufs, mn = _LANG_TABLES[lang][1]
        return _suffix_stem_py(_fold_py(tok, lang), sufs, mn)
    # unknown langs fall back to the EN analyzer (full Porter)
    return snowball_stem_py(tok, "en")


def lang_stopwords(lang: str) -> list[str]:
    return _LANG_TABLES[lang][0] if lang in _LANG_TABLES else EN_STOPWORDS


def sql_fulltext_tokens(lang: str, text_expr: str = "text") -> str:
    """DuckDB SQL producing the stemmed fulltext token list for a text
    column — the oracle twin of fulltext_tokens() for light-stemmer and
    snowball languages (split on non-letter/digit, stopword-filter
    accented and folded spellings, stem)."""
    from dgraph_spark.functions.dedicated_stemmers import (
        DEDICATED_STEM_LANGS, dedicated_tokens_sql)
    from dgraph_spark.functions.light_stemmers import (LIGHT_STEM_LANGS,
                                                       light_stem_tokens_sql)
    from dgraph_spark.functions.snowball import (SNOWBALL_LANGS,
                                                 snowball_tokens_sql)

    if (lang not in LIGHT_STEM_LANGS and lang not in SNOWBALL_LANGS
            and lang not in DEDICATED_STEM_LANGS):
        raise KeyError(
            f"stemmed sql tokens only for "
            f"{sorted(LIGHT_STEM_LANGS) + sorted(SNOWBALL_LANGS) + sorted(DEDICATED_STEM_LANGS)}, "
            f"not {lang!r}")
    stop_raw = lang_stopwords(lang)
    stops = set(stop_raw)
    if lang in _FOLD:
        stops |= {_fold_py(w, lang) for w in stop_raw}
    stop = ", ".join(f"'{w}'" for w in sorted(stops))
    src = (f"replace(lower({text_expr}), 'ё', 'е')" if lang == "ru"
           else f"lower({text_expr})")
    toks = (f"list_filter(list_filter(string_split_regex("
            f"{src}, '[^\\pL\\pM\\pN]+'), x -> x != ''), "
            f"x -> NOT list_contains([{stop}], x))")
    if lang in SNOWBALL_LANGS:
        return snowball_tokens_sql(toks, lang)
    if lang in DEDICATED_STEM_LANGS:
        return dedicated_tokens_sql(toks, lang)
    return light_stem_tokens_sql(toks, lang)


def sql_fulltext_match(lang: str, query: str, text_expr: str = "text") -> str:
    """DuckDB boolean SQL replicating the per-language analyzer match —
    generated from the SAME stopword/suffix tables as the Spark side."""
    if lang in _CJK_LANGS:
        qtoks = _query_text_tokens(query, lang)
        qlist = ", ".join(f"'{t}'" for t in qtoks)
        runs = (f"regexp_extract_all(lower({text_expr}), "
                f"'{_CJK_RUNS_RE_RE2}')")
        toks = (f"flatten(list_transform({runs}, r -> "
                f"CASE WHEN regexp_matches(r, '^[a-z0-9]') "
                f"OR length(r) = 1 THEN [r] "
                f"ELSE list_transform(range(1, length(r)), "
                f"i -> substr(r, i::INT, 2)) END))")
        return f"list_has_any({toks}, [{qlist}])"
    from dgraph_spark.functions.light_stemmers import (LIGHT_STEM_LANGS,
                                                       light_stem_tokens_sql)
    stop_raw, (sufs, mn) = _LANG_TABLES.get(lang, (EN_STOPWORDS, (None, None)))
    from dgraph_spark.functions.dedicated_stemmers import \
        DEDICATED_STEM_LANGS
    from dgraph_spark.functions.snowball import SNOWBALL_LANGS
    if lang not in _LANG_TABLES and lang not in SNOWBALL_LANGS:
        raise KeyError(f"sql twin only for "
                       f"{sorted(_LANG_TABLES) + sorted(SNOWBALL_LANGS)}, "
                       f"not {lang!r}")
    if (lang in LIGHT_STEM_LANGS or lang in SNOWBALL_LANGS
            or lang in DEDICATED_STEM_LANGS):
        stemmed = sql_fulltext_tokens(lang, text_expr)
        qtoks = _query_text_tokens(query, lang)
        qlist = ", ".join(f"'{t}'" for t in qtoks)
        return f"list_has_any({stemmed}, [{qlist}])"
    src, dst = _FOLD[lang]
    folded = f"translate(lower({text_expr}), '{src}', '{dst}')"
    if lang == "de":
        folded = f"replace({folded}, 'ß', 'ss')"
    cases = " ".join(
        f"WHEN length(x) >= {mn + len(suf)} AND x LIKE '%{suf}' "
        f"THEN substr(x, 1, length(x) - {len(suf)})"
        for suf in sufs
    )
    stem_sql = f"(CASE {cases} ELSE x END)"
    stops = set(stop_raw) | {_fold_py(w, lang) for w in stop_raw}
    stop = ", ".join(f"'{w}'" for w in sorted(stops))
    qtoks = [stem_lang_py(t.lower(), lang) for t in query.split()
             if t and _fold_py(t.lower(), lang) not in stops]
    qlist = ", ".join(f"'{t}'" for t in qtoks)
    return f"""list_has_any(
  list_transform(
    list_filter(
      list_filter(string_split_regex({folded}, '[^a-z0-9]+'), x -> x != ''),
      x -> NOT list_contains([{stop}], x)),
    x -> {stem_sql}),
  [{qlist}])"""


def _candidate_filter(toks: Column, qtoks: list[str], lang: str) -> Column:
    """Per-token analogue of _text_prefilter: a token can only stem to
    a query token if it CONTAINS the stem's verbatim-substring needle,
    so when the caller only needs the match decision (anyoftext /
    alloftext), all other tokens are dropped BEFORE the stem chain —
    the expensive per-token stemmer then runs on ~the 1-2 candidate
    tokens of a matching row instead of every token (the en full-Porter
    chain made stemming every token 6x the whole query)."""
    needles = sorted({_stem_substring(t, lang) for t in qtoks})

    def keep(t):
        tf = _fold_expr(t, lang) if lang in _FOLD else t
        cond = tf.contains(needles[0])
        for n in needles[1:]:
            cond = cond | tf.contains(n)
        return cond

    return F.filter(toks, keep)


def fulltext_tokens(col: Column, lang: str = "en",
                    candidates: list[str] | None = None) -> Column:
    """term tokens minus stopwords, suffix-stemmed (expression-only).
    ``lang`` routes to that language's stopword + stemmer tables
    (tok/stemmers.go per-language analyzers); unknown langs fall back
    to the EN analyzer. ``candidates``: stemmed query tokens — when
    given, tokens that cannot stem to any of them are dropped before
    the stemmer (see _candidate_filter); only valid when the caller
    solely compares the result against those tokens."""
    if lang in _CJK_LANGS:
        runs = F.regexp_extract_all(F.lower(col), F.lit(_CJK_RUNS_RE), 0)
        return F.flatten(F.transform(runs, lambda r: F.when(
            r.rlike("^[a-z0-9]") | (F.length(r) == 1), F.array(r)
        ).otherwise(F.transform(
            F.sequence(F.lit(1), F.length(r) - 1),
            lambda i: r.substr(i, F.lit(2))))))
    from dgraph_spark.functions.light_stemmers import (LIGHT_STEM_LANGS,
                                                       light_stem_tokens_expr)
    if lang in LIGHT_STEM_LANGS:
        # de/es/fr: the reference's light stemmers fold (or don't) inside
        # the algorithm, so tokens are split UNFOLDED; stopwords match
        # both accented and folded spellings
        stops = _LANG_TABLES[lang][0]
        toks = F.filter(F.split(F.lower(col), TERM_SPLIT_RE),
                        lambda t: t != "")
        allstops = sorted(set(stops) | {_fold_py(w, lang) for w in stops})
        toks = F.filter(toks, lambda t: ~t.isin(*allstops))
        if candidates:
            toks = _candidate_filter(toks, candidates, lang)
        return light_stem_tokens_expr(toks, lang)
    from dgraph_spark.functions.snowball import (SNOWBALL_LANGS,
                                                 snowball_tokens_expr)
    if lang in SNOWBALL_LANGS:
        # da/no/sv/ru/en: the published Snowball algorithms operate on
        # UNFOLDED tokens (æ/ø/å and cyrillic are first-class); the one
        # exception is Russian's prescribed ё -> е normalization
        stops = lang_stopwords(lang)
        src = F.regexp_replace(F.lower(col), "ё", "е") if lang == "ru" \
            else F.lower(col)
        toks = F.filter(F.split(src, TERM_SPLIT_RE), lambda t: t != "")
        allstops = sorted(set(stops) | ({_fold_py(w, lang) for w in stops}
                                        if lang in _FOLD else set()))
        toks = F.filter(toks, lambda t: ~t.isin(*allstops))
        if candidates:
            toks = _candidate_filter(toks, candidates, lang)
        return snowball_tokens_expr(toks, lang)
    from dgraph_spark.functions.dedicated_stemmers import (
        DEDICATED_STEM_LANGS, dedicated_tokens_expr)
    if lang in DEDICATED_STEM_LANGS:
        # ar/ckb/hi: the reference's filterStemmers applies ONLY the
        # bleve stemmer filter (no per-language normalizer), so tokens
        # split lowercased and otherwise untouched
        stops = sorted(set(_LANG_TABLES[lang][0]))
        toks = F.filter(F.split(F.lower(col), TERM_SPLIT_RE),
                        lambda t: t != "")
        toks = F.filter(toks, lambda t: ~t.isin(*stops))
        if candidates:
            toks = _candidate_filter(toks, candidates, lang)
        return dedicated_tokens_expr(toks, lang)
    if lang in _LANG_TABLES:
        stops, (sufs, mn) = _LANG_TABLES[lang]
        folded = _fold_expr(F.lower(col), lang)
        toks = F.filter(F.split(folded, TERM_SPLIT_RE), lambda t: t != "")
        allstops = sorted(set(stops) | {_fold_py(w, lang) for w in stops})
        toks = F.filter(toks, lambda t: ~t.isin(*allstops))
        if candidates:
            toks = _candidate_filter(toks, candidates, lang)
        return F.transform(toks, lambda t: _suffix_stem_expr(t, sufs, mn))
    # unknown langs fall back to the EN analyzer (now full Porter)
    toks = term_tokens(col)
    toks = F.filter(toks, lambda t: ~t.isin(*EN_STOPWORDS))
    if candidates:
        toks = _candidate_filter(toks, candidates, lang)
    return snowball_tokens_expr(toks, "en")


def ngrams(col: Column, n: int = 3) -> Column:
    """Character n-grams of the lowercased string (tok/tok.go ngram)."""
    lowered = F.lower(col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(lowered) - (n - 1), F.lit(0))),
        lambda i: lowered.substr(i, F.lit(n)),
    )


def trigrams(col: Column) -> Column:
    return ngrams(col, 3)


def any_of_terms(col: Column, query: str) -> Column:
    """anyofterms(p, "a b") — any whitespace-separated query term present."""
    qtoks = [t.lower() for t in query.split() if t]
    if not qtoks:
        return F.lit(False)
    return F.arrays_overlap(term_tokens(col), F.array(*[F.lit(t) for t in qtoks]))


def all_of_terms(col: Column, query: str) -> Column:
    """allofterms — every query term present (worker/task.go:303-305
    needsIntersect)."""
    qtoks = list(dict.fromkeys(t.lower() for t in query.split() if t))
    if not qtoks:
        return F.lit(True)
    toks = term_tokens(col)
    cond = F.array_contains(toks, qtoks[0])
    for t in qtoks[1:]:
        cond = cond & F.array_contains(toks, t)
    return cond


def _query_text_tokens(query: str, lang: str) -> list[str]:
    if lang in _CJK_LANGS:
        return _cjk_bigrams_py(query)
    if lang in _LANG_TABLES:
        stops = set(lang_stopwords(lang))
        if lang in _FOLD:
            stops |= {_fold_py(w, lang) for w in lang_stopwords(lang)}

        def key(t):
            return _fold_py(t, lang) if lang in _FOLD else t

        return [stem_lang_py(t.lower(), lang) for t in query.split()
                if t and key(t.lower()) not in stops]
    # en (and unknown langs): the EN analyzer — stopwords + full Porter
    return [stem_lang_py(t.lower(), "en") for t in query.split()
            if t and t.lower() not in EN_STOPWORDS]


# longest suffix a language's stemmer can APPEND during a replacement
# rule (fr -ficatrice -> -fier etc.): the appended chars may be absent
# from the document token, so the prefilter needle must drop them.
# nl/fi run full Snowball with REPLACEMENTS (heden->heid) and mid-word
# undoubling — their safe truncations were found empirically (15k-word
# audits per language, tests/test_functions.py::test_prefilter_superset)
_MAX_APPEND = {"fr": 4, "es": 1, "pt": 2, "nl": 2, "fi": 4}

# Languages whose stems are NOT substrings of the token at any safe
# truncation: Turkish devoices final consonants, appends harmony
# vowels, and reattaches held ndA/nA heads mid-stem (tondakine ->
# tonne); the Lucene French light stemmer contracts doubled letters
# mid-word (occybtauements -> ocybtau). For these, anyoftext/alloftext
# skip the substring prefilter and the candidate token filter entirely
# — the analyzer (a vectorized udf for tr, a small column expr for fr)
# runs on every row.
PREFILTER_UNSAFE = {"tr", "fr"}


def _stem_substring(t: str, lang: str) -> str:
    """A substring every document token stemming to ``t`` must contain.

    Suffix-stripping stemmers only ever REMOVE a suffix, so the stem is
    a prefix of the token and hence a substring of the text — MINUS any
    replacement-appended tail (_MAX_APPEND; EN's ies->y likewise), and
    FOLDED, because the prefilter scans fold-normalized text while
    light/snowball stems keep accents (an unfolded needle like
    'løs'/'alegrí' would never hit folded text: false negatives)."""
    if lang in _CJK_LANGS:
        return t  # bigrams are verbatim substrings of the text
    if lang in _LANG_TABLES and lang not in _FOLD:
        # ar/ckb/hi: suffix/prefix strips only (audited 0-violation),
        # no fold table exists for them
        return t
    if lang not in _LANG_TABLES:
        # en (Porter): replacements share a prefix with the replaced
        # suffix except for at most one trailing char ('e'/'i'
        # appends, and biliti->ble whose surviving 'l' follows the
        # shared 'b' — e.g. stem 'sensibl' vs text 'sensibility'),
        # so dropping one char always yields a verbatim substring
        return t[:-1] if len(t) > 1 else t
    k = _MAX_APPEND.get(lang, 0)
    if k:
        t = t[:max(len(t) - k, 0)]
    return _fold_py(t, lang)


def _text_prefilter(col: Column, qtoks: list[str], lang: str,
                    mode_any: bool) -> Column:
    """Cheap superset test ahead of the full analyzer: substring
    containment on the lowered (and fold-normalized) text. The analyzer
    expression (stopword set + stem CASE tree per token) is ~10x the
    cost of a StringContains scan, so running it only on rows that pass
    this filter keeps the hot path inside whole-stage codegen doing
    almost no work per non-matching row — the Spark analogue of the
    reference consulting its fulltext index before touching postings
    (worker/tokens.go)."""
    lowered = F.lower(col)
    if lang in _LANG_TABLES and lang in _FOLD:
        lowered = _fold_expr(lowered, lang)
    conds = [lowered.contains(_stem_substring(t, lang)) for t in qtoks]
    out = conds[0]
    for c in conds[1:]:
        out = (out | c) if mode_any else (out & c)
    return out


def any_of_text(col: Column, query: str, lang: str = "en") -> Column:
    """anyoftext — fulltext analyzer applied to both sides; `pred@de`
    routes both sides through the German analyzer (tok/stemmers.go)."""
    qtoks = _query_text_tokens(query, lang)
    if not qtoks:
        return F.lit(False)
    if lang in PREFILTER_UNSAFE:
        return F.arrays_overlap(
            fulltext_tokens(col, lang),
            F.array(*[F.lit(t) for t in qtoks]))
    exact = F.arrays_overlap(
        fulltext_tokens(col, lang, candidates=qtoks),
        F.array(*[F.lit(t) for t in qtoks]))
    # the CASE WHEN gates the pure-Catalyst analyzers per row; for the
    # vectorized en path Catalyst extracts the udf into an eager
    # ArrowEvalPython node, but by then the candidate filter has
    # already shrunk a non-matching row's token array to ~empty, so
    # the per-miss cost is the JVM split/filter plus a near-empty
    # Arrow batch
    return F.when(_text_prefilter(col, qtoks, lang, mode_any=True),
                  exact).otherwise(F.lit(False))


def all_of_text(col: Column, query: str, lang: str = "en") -> Column:
    qtoks = _query_text_tokens(query, lang)
    if not qtoks:
        return F.lit(True)
    if lang in PREFILTER_UNSAFE:
        toks = fulltext_tokens(col, lang)
        cond = F.array_contains(toks, qtoks[0])
        for t in qtoks[1:]:
            cond = cond & F.array_contains(toks, t)
        return cond
    toks = fulltext_tokens(col, lang, candidates=qtoks)
    cond = F.array_contains(toks, qtoks[0])
    for t in qtoks[1:]:
        cond = cond & F.array_contains(toks, t)
    return F.when(_text_prefilter(col, qtoks, lang, mode_any=False),
                  cond).otherwise(F.lit(False))


# ---- custom tokenizer plugins (tok/tok.go:134-151 LoadCustomTokenizer;
# queried via anyof/allof — worker/task.go:269-270). A tokenizer is any
# Column -> Column(array<string>) function registered by name.
_CUSTOM_TOKENIZERS: dict = {}


def register_tokenizer(name: str, fn) -> None:
    """Register a custom tokenizer: ``fn(col) -> array<string> Column``.
    The Spark analogue of dgraph's Go-plugin tokenizers — a column
    expression (or pandas-UDF-backed column) instead of a shared object."""
    _CUSTOM_TOKENIZERS[name] = fn


def get_tokenizer(name: str):
    if name not in _CUSTOM_TOKENIZERS:
        raise KeyError(f"unknown custom tokenizer {name!r}")
    return _CUSTOM_TOKENIZERS[name]


def any_of_custom(col: Column, tokenizer: str, query: str) -> Column:
    """anyof(pred, tokenizer, q) — any shared custom token."""
    fn = get_tokenizer(tokenizer)
    toks = fn(col)
    qtoks = [t for t in query.split() if t]
    if not qtoks:
        return F.lit(False)
    return F.arrays_overlap(toks, F.array(*[F.lit(t) for t in qtoks]))


def all_of_custom(col: Column, tokenizer: str, query: str) -> Column:
    fn = get_tokenizer(tokenizer)
    toks = fn(col)
    qtoks = list(dict.fromkeys(t for t in query.split() if t))
    if not qtoks:
        return F.lit(True)
    cond = F.array_contains(toks, qtoks[0])
    for t in qtoks[1:]:
        cond = cond & F.array_contains(toks, t)
    return cond


def regexp_match(col: Column, pattern: str) -> Column:
    """regexp(p, /re/flags) — flags: i. Spark evaluates the regex exactly;
    no trigram prefilter + verify pass needed (worker/task.go:1161-1199)."""
    body, _, flags = pattern.rpartition("/")
    body = body.lstrip("/") if body.startswith("/") else body
    if flags not in ("", "i"):
        # worker/task.go:2154 — `i` is the only modifier
        raise ValueError(f"Invalid regexp modifier: {flags}")
    if "i" in flags:
        # (?u) too: Java regex needs UNICODE_CASE for non-ASCII case
        # folding (Go's regexp/syntax folds Unicode by default)
        body = "(?iu)" + body
    return col.rlike(body)


def fuzzy_match(col: Column, target: str, max_dist: int) -> Column:
    """match(p, s, dist) — trigram-index candidacy THEN Levenshtein <= dist
    (worker/match.go:70 uidsForMatch merges trigram postings; matchFuzzy
    checks the distance). A value with no trigram in common with the
    query is never a candidate, however small its edit distance."""
    q = target.lower()
    grams = [q[i: i + 3] for i in range(len(q) - 2)]
    if not grams:
        # query shorter than one trigram -> no index candidates
        return F.lit(False)
    overlap = F.arrays_overlap(
        ngrams(col, 3), F.array(*[F.lit(g) for g in grams])
    )
    return overlap & (F.levenshtein(F.lower(col), F.lit(q)) <= max_dist)


def ngram_search(col: Column, query: str, n: int = 3) -> Column:
    """ngram(p, q): n-gram containment — all query n-grams appear in the
    stored value's n-gram set (tok/tok.go:447-551)."""
    q = query.lower()
    grams = {q[i : i + n] for i in range(max(len(q) - n + 1, 0))} or {q}
    toks = ngrams(col, n)
    cond = F.lit(True)
    for g in grams:
        cond = cond & F.array_contains(toks, g)
    return cond
