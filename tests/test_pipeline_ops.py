"""Training-data pipeline operators: dedup, text stats, multimodal."""

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_exact_duplicates_synthetic(spark):
    from dgraph_spark.operators.dedup import exact_duplicates

    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")],
        "doc_id long, text string",
    )
    out = exact_duplicates(df).collect()
    assert len(out) == 1
    assert out[0]["ids"] == [1, 2]


def test_ngram_jaccard_finds_planted_dups(docs):
    from dgraph_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs, threshold=0.7).collect()
    assert len(pairs) > 0
    assert all(r["jac"] >= 0.7 for r in pairs)


def test_ngram_jaccard_density_guard(spark):
    """A duplicate-dense corpus must be refused LOUDLY before the
    quadratic candidate join launches, with minhash_lsh_pairs named as
    the linear alternative; a higher cap (or None) forces the exact
    join."""
    from dgraph_spark.operators.dedup import ngram_jaccard_pairs

    # 40 near-identical docs: every prefix shingle is shared by all,
    # so the candidate bound is ~C(40,2) per posting ≈ 780/doc
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta eta theta doc{i}")
         for i in range(40)],
        "doc_id long, text string")
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        ngram_jaccard_pairs(docs, 0.5, max_candidates_per_doc=10.0)
    # escape hatch: force the exact join on the same corpus
    forced = ngram_jaccard_pairs(docs, 0.5, max_candidates_per_doc=None)
    assert forced.count() > 0


def test_minhash_lsh_recall_vs_exact(docs):
    from dgraph_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {(r["i"], r["j"]) for r in ngram_jaccard_pairs(docs, 0.7).collect()}
    lsh = {(r["i"], r["j"]) for r in minhash_lsh_pairs(docs, 0.7).collect()}
    assert lsh <= exact  # exact verification => precision 1
    assert len(lsh) >= 0.8 * len(exact)  # banded LSH recall at 0.7


def test_jaccard_dense_bitset_assembly(spark):
    """Pin the dense-vocabulary bitset index against a Python reference
    (round 11: the bitset is assembled with a two-level bit_or partial
    aggregation instead of collect_list + an interpreted per-word HOF —
    the words must be bit-identical, and the dense verify must match
    brute-force jaccard over the same shingle sets)."""
    import re

    from dgraph_spark.operators.dedup import (_jaccard_index,
                                              invalidate_dedup_caches,
                                              ngram_jaccard_pairs)

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over a lazy dog"),
        (3, "pack my box with five dozen liquor jugs"),
        (4, "pack my box with five dozen liquor jugs today"),
        (5, "completely unrelated text about spark plans"),
        # 6/7 share exactly one rare shingle ("shared token") and
        # nothing else: they pass the prefix filter (candidate pair)
        # but must be pruned — the per-row positional/length filters
        # and the verify may not let a low-jaccard pair through
        (6, "alpha beta gamma delta epsilon shared token one two"),
        (7, "red orange yellow green blue shared token nine ten"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n = 2
    pref_sz, sh, bm, n_docs, _ = _jaccard_index(docs, 0.5, n,
                                                "text", "doc_id")
    assert bm is not None, "tiny vocab must take the dense path"

    def shingles(text):
        # ASCII-only fixture, so \W+ matches the engine's
        # TERM_SPLIT_RE ([^\p{L}\p{M}\p{N}]+) on these rows
        toks = [t for t in re.split(r"[^0-9a-zA-Z]+", text.lower()) if t]
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    ref_sets = {i: shingles(t) for i, t in rows}
    vocab = sorted(set().union(*ref_sets.values()))
    gid = {g: k for k, g in enumerate(vocab)}
    nw = (len(vocab) + 63) // 64

    for r in bm.collect():
        want = [0] * nw
        for g in ref_sets[r["id"]]:
            want[gid[g] // 64] |= 1 << (gid[g] % 64)
        got = [w if w >= 0 else w + (1 << 64) for w in r["bm"]]
        assert got == want, f"bitset mismatch for doc {r['id']}"
        assert r["sz"] == len(ref_sets[r["id"]])

    # end-to-end: the dense verify equals brute-force jaccard
    got_pairs = {(r["i"], r["j"]): r["jac"]
                 for r in ngram_jaccard_pairs(docs, 0.5).collect()}
    want_pairs = {}
    for i, a in ref_sets.items():
        for j, b in ref_sets.items():
            if i < j:
                jac = len(a & b) / len(a | b)
                if jac >= 0.5:
                    want_pairs[(i, j)] = round(jac, 4)
    assert got_pairs == want_pairs
    invalidate_dedup_caches()


def test_simhash_pairs(docs):
    from dgraph_spark.operators.dedup import simhash_near_pairs

    pairs = simhash_near_pairs(docs, max_hamming=3).collect()
    assert all(r["dist"] <= 3 for r in pairs)


def test_embedding_near_dups_blocked(spark):
    from dgraph_spark.operators.dedup import embedding_near_dups

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    out = embedding_near_dups(emb, threshold=0.3, block_col="label")
    rows = out.collect()
    assert all(r["cos"] >= 0.3 for r in rows)


def test_text_stats(docs):
    from dgraph_spark.operators.textstats import text_stats

    out = text_stats(docs)
    rows = out.collect()
    assert len(rows) == docs.count()
    r = rows[0]
    assert r["n_tokens"] > 0
    assert 0.0 <= r["quality"] <= 1.0
    assert len(r["fp"]) == 32
    langs = {r["lang_pred"] for r in rows}
    assert langs <= {"en", "fr", "de", "es", "und"}


def test_lang_id_markers(spark):
    from dgraph_spark.operators.textstats import lang_id

    df = spark.createDataFrame(
        [
            ("the cat and the dog is here",),
            ("le chat est dans la maison avec les autres",),
            ("der hund ist nicht mit der katze",),
            ("zzz qqq www",),
        ],
        "text string",
    )
    got = [r["l"] for r in df.select(lang_id(F.col("text")).alias("l")).collect()]
    assert got == ["en", "fr", "de", "und"]


def test_multimodal_image_features(docs):
    from dgraph_spark.operators.multimodal import (
        extract_image_features,
        media_table_from_docs,
        sample_frames,
    )

    media = media_table_from_docs(docs.limit(20))
    feats = extract_image_features(media).collect()
    assert len(feats) == 20
    for f in feats:
        # real decode: solid color (id%256, 7id%256, 13id%256) recovered
        # exactly from the P6 raster
        assert f["width"] == 32 and f["height"] >= 1
        d = f["media_id"]
        assert (f["mean_r"], f["mean_g"], f["mean_b"]) == (
            d % 256, d * 7 % 256, d * 13 % 256)
        assert len(f["feature"]) == 16
        assert abs(sum(f["feature"]) - 1.0) < 1e-6

    frames = sample_frames(media.limit(3), every_n_bytes=64)
    rows = frames.collect()
    assert len(rows) >= 3
    assert all(len(bytes(r["frame"])) <= 64 for r in rows)


@pytest.fixture(scope="module")
def docs_med(spark):
    from tests.conftest import SF_MED

    return spark.read.parquet(f"{SF_MED}/documents.parquet")


def test_minhash_lsh_measured_recall_sf001(docs_med):
    """Quantitative LSH check at sf0.01 (VERDICT r1 item 4): banded
    16x4 MinHash at t=0.7 must keep recall >= 0.9 against the exact
    jaccard pairs, with precision 1 from the verify step."""
    from dgraph_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {(r["i"], r["j"]) for r in ngram_jaccard_pairs(docs_med, 0.7).collect()}
    lsh = {(r["i"], r["j"]) for r in minhash_lsh_pairs(docs_med, 0.7).collect()}
    assert lsh <= exact
    assert len(exact) > 0
    recall = len(lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.3f} < 0.9 ({len(lsh)}/{len(exact)})"


def test_simhash_banded_join_is_exact_sf001(spark, docs_med):
    """Brute-force Hamming oracle at sf0.01 (VERDICT r1 item 4): the
    4-band pigeonhole join must return EXACTLY the all-pairs set within
    Hamming distance 3 — banding is a pruning, never a loss."""
    from dgraph_spark.operators.dedup import simhash64, simhash_near_pairs

    sims = simhash64(docs_med).cache()
    brute = {
        (r["i"], r["j"])
        for r in sims.alias("a").crossJoin(sims.alias("b"))
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("i"), F.col("b.id").alias("j"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("d"),
        )
        .where(F.col("d") <= 3)
        .collect()
    }
    banded = {(r["i"], r["j"]) for r in simhash_near_pairs(docs_med, 3).collect()}
    assert banded == brute


def test_dedup_index_cache_detects_rewritten_parquet(spark, tmp_path):
    """Rewriting the parquet directory between calls must MISS the
    shingle cache even though the plan semanticHash is identical
    (ADVICE r3: stale persisted index returned wrong dedup results)."""
    import time

    from dgraph_spark.operators.dedup import _materialized_shingles

    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma")],
        "doc_id long, text string").write.mode("overwrite").parquet(p)
    sh1, n1 = _materialized_shingles(spark.read.parquet(p), "text", "doc_id", 2)
    assert n1 == 2
    time.sleep(1.1)  # ensure mtime tick
    spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
         (3, "delta epsilon zeta")],
        "doc_id long, text string").write.mode("overwrite").parquet(p)
    sh2, n2 = _materialized_shingles(spark.read.parquet(p), "text", "doc_id", 2)
    assert n2 == 3  # fresh index, not the stale cached one


def test_multimodal_real_decoders():
    """The decode kernels are real: PPM with comments, BMP with row
    padding + bottom-up order, PCM16 WAV — all pure numpy, checked
    against hand-built payloads."""
    import numpy as np

    from dgraph_spark.operators.multimodal import (decode_bmp, decode_ppm,
                                                   decode_wav,
                                                   _decode_image_bytes)

    # PPM P6 with a header comment; 2x2 distinct pixels
    px = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  10, 20, 30])
    ppm = b"P6\n# a comment\n2 2\n255\n" + px
    img = decode_ppm(ppm)
    assert img.shape == (2, 2, 3)
    assert tuple(img[0, 0]) == (255, 0, 0) and tuple(img[1, 1]) == (10, 20, 30)

    # grayscale P5
    p5 = b"P5\n3 1\n255\n" + bytes([1, 2, 3])
    assert decode_ppm(p5).tolist() == [[1, 2, 3]]

    # BMP: 3x2, 24bpp, bottom-up, stride padded 9->12
    rows_bgr = [
        bytes([30, 20, 10, 60, 50, 40, 90, 80, 70]) + b"\x00\x00\x00",  # bottom row
        bytes([3, 2, 1, 6, 5, 4, 9, 8, 7]) + b"\x00\x00\x00",           # top row
    ]
    header = (b"BM" + (54 + 24).to_bytes(4, "little") + b"\x00\x00\x00\x00"
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little") + (3).to_bytes(4, "little")
              + (2).to_bytes(4, "little") + (1).to_bytes(2, "little")
              + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
              + b"\x00" * 20)
    bmp = header + rows_bgr[0] + rows_bgr[1]
    img = decode_bmp(bmp)
    assert img.shape == (2, 3, 3)
    assert tuple(img[0, 0]) == (1, 2, 3)      # top-left RGB
    assert tuple(img[1, 2]) == (70, 80, 90)   # bottom-right RGB

    # WAV: 8 samples of a known square wave at 8kHz mono
    samples = np.array([1000, -1000] * 4, dtype="<i2")
    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    wav = (b"RIFF" + (36 + 16).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little") + fmt
           + b"data" + (16).to_bytes(4, "little") + samples.tobytes())
    rate, ch, got = decode_wav(wav)
    assert (rate, ch) == (8000, 1) and got.tolist() == samples.tolist()

    # codecs without an in-container decoder fail loudly with the
    # detected container (pillow absent in this sandbox — when
    # importable, _pil_decode handles these instead; JPEG/GIF now
    # have real in-container decoders, see test_jpeg_*/test_gif_*)
    import pytest as _pytest
    try:
        import PIL  # noqa: F401
    except ImportError:
        with _pytest.raises(NotImplementedError, match="mp4"):
            _decode_image_bytes(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 8)


def test_png_roundtrip_all_color_types():
    """encode_png(filter-0) -> decode_png recovers every supported
    color type exactly (gray / gray+alpha / RGB / RGBA)."""
    import numpy as np

    from dgraph_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(20260816)
    for shape in [(5, 7), (5, 7, 2), (5, 7, 3), (5, 7, 4), (1, 1, 3),
                  (97, 32, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = decode_png(encode_png(img))
        assert got.shape == img.shape
        assert np.array_equal(got, img), shape


def _png_with_filters(img, ftypes):
    """Independent FORWARD filterer (PNG spec §4.5.4, written from the
    spec, not from decode_png): applies the given per-row filter types
    and assembles a full PNG, so decode_png's unfilter is checked
    against a reference implementation of the inverse direction."""
    import zlib

    import numpy as np

    h, w, c = img.shape
    stride, bpp = w * c, c
    recon = img.reshape(h, stride).astype(int)
    raw = b""
    for y, f in enumerate(ftypes):
        cur = recon[y]
        prior = recon[y - 1] if y else np.zeros(stride, int)
        left = np.concatenate([np.zeros(bpp, int), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, int), prior[:-bpp]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prior
        elif f == 3:
            filt = cur - ((left + prior) // 2)
        elif f == 4:
            p = left + prior - upleft
            pa = np.abs(p - left)
            pb = np.abs(p - prior)
            pc = np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prior, upleft))
            filt = cur - pred
        raw += bytes([f]) + bytes((filt % 256).astype(np.uint8))

    def chunk(typ, body):
        return (len(body).to_bytes(4, "big") + typ + body
                + (zlib.crc32(typ + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes((8, {1: 0, 2: 4, 3: 2, 4: 6}[c], 0, 0, 0)))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_unfilter_all_filter_types():
    """decode_png vs the independent forward filterer: every filter
    type 0-4, including rows mixing them, on random RGB / RGBA / gray
    images (gradient + noise so Sub/Avg/Paeth deltas are nontrivial)."""
    import numpy as np

    from dgraph_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        img = (rng.integers(0, 256, size=(9, 6, c)).astype(np.uint8))
        for f in range(5):
            got = decode_png(_png_with_filters(img, [f] * 9))
            want = img[:, :, 0] if c == 1 else img
            assert np.array_equal(got, want), (c, f)
        mixed = [0, 1, 2, 3, 4, 4, 3, 2, 1]
        got = decode_png(_png_with_filters(img, mixed))
        want = img[:, :, 0] if c == 1 else img
        assert np.array_equal(got, want), (c, "mixed")


def test_png_loud_rejections():
    import zlib

    import numpy as np
    import pytest as _pytest

    from dgraph_spark.operators.multimodal import decode_png, encode_png

    ok = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))

    def patched_ihdr(**kw):
        w, h = 2, 2
        fields = {"depth": 8, "ct": 2, "interlace": 0} | kw
        ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + bytes((fields["depth"], fields["ct"], 0, 0,
                         fields["interlace"])))
        chunk = ((13).to_bytes(4, "big") + b"IHDR" + ihdr
                 + (zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
                 .to_bytes(4, "big"))
        sig_end = 8 + 12 + 13
        return ok[:8] + chunk + ok[sig_end:]

    # ct=3 is now SUPPORTED given a PLTE chunk; without one it's a
    # malformed-stream error, not a capability rejection
    with _pytest.raises(ValueError, match="missing PLTE"):
        decode_png(patched_ihdr(ct=3))
    with _pytest.raises(NotImplementedError, match="color type 7"):
        decode_png(patched_ihdr(ct=7))
    with _pytest.raises(NotImplementedError, match="bit depth 4"):
        decode_png(patched_ihdr(depth=4))
    with _pytest.raises(NotImplementedError, match="interlace method 2"):
        decode_png(patched_ihdr(interlace=2))
    corrupted = ok[:20] + bytes([ok[20] ^ 0xFF]) + ok[21:]
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(corrupted)
    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JUNK" * 4)


def test_png_media_table_matches_ppm(spark):
    """The PNG media table decodes to the SAME features as the PPM
    table (same closed-form stats, different codec underneath)."""
    from dgraph_spark.operators.multimodal import (
        extract_image_features, media_table_from_docs,
        png_table_from_docs)

    docs = spark.createDataFrame(
        [(i, "x" * (i * 37 % 200 + 1)) for i in range(1, 13)],
        "doc_id long, text string").withColumn("n_chars",
                                               F.length("text"))
    cols = ["media_id", "width", "height", "mean_r", "mean_g", "mean_b"]
    a = {tuple(r) for r in extract_image_features(
        media_table_from_docs(docs)).select(cols).collect()}
    b = {tuple(r) for r in extract_image_features(
        png_table_from_docs(docs)).select(cols).collect()}
    assert a == b and len(a) == 12


def test_png_palette_decode():
    """Hand-assembled palette (color type 3) PNG: 8-bit indices +
    PLTE lookup must recover the exact RGB raster."""
    import zlib

    import numpy as np

    from dgraph_spark.operators.multimodal import decode_png

    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                        [7, 42, 99]], dtype=np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    h, w = idx.shape

    def chunk(typ, body):
        return (len(body).to_bytes(4, "big") + typ + body
                + (zlib.crc32(typ + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes((8, 3, 0, 0, 0)))
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"PLTE", palette.tobytes())
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    got = decode_png(png)
    assert np.array_equal(got, palette[idx])

    # out-of-range index is a loud stream error
    bad_idx = idx.copy()
    bad_idx[0, 0] = 9
    raw = b"".join(b"\x00" + bad_idx[y].tobytes() for y in range(h))
    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"PLTE", palette.tobytes())
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="palette index"):
        decode_png(bad)


def _lzw_compress(indices, min_code):
    """Independent FORWARD GIF-LZW compressor (spec appendix F,
    written from the spec, not from decode_gif): real string-table
    compression with variable code widths, so the decoder is checked
    against genuinely compressed streams, not just the encoder's
    pass-through mode."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = []
    acc = nbits = 0
    buf = bytearray()

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(k,): k for k in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    emit(clear, width)
    prefix = ()
    for px in indices:
        cand = prefix + (int(px),)
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4095:
            emit(clear, width)
            table = {(k,): k for k in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        prefix = (int(px),)
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


def test_gif_roundtrip_and_real_lzw():
    """decode_gif on the fixture encoder's pass-through streams AND on
    genuinely compressed streams from the independent forward LZW."""
    import numpy as np

    from dgraph_spark.operators.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(20260816)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    # repetitive data (LZW-friendly) + noise
    rep = np.tile(np.arange(16, dtype=np.uint8), 400).reshape(80, 80)
    noise = rng.integers(0, 256, (33, 41)).astype(np.uint8)
    for idx in (rep, noise):
        h, w = idx.shape
        got = decode_gif(encode_gif(idx, pal))
        assert np.array_equal(got, pal[idx.astype(int)]), "pass-through"
        # hand-assemble a GIF whose data section is REAL LZW
        min_code = 8
        lzw = _lzw_compress(idx.reshape(-1), min_code)
        gif = bytearray(b"GIF89a")
        gif += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        gif += bytes([0x87, 0, 0]) + pal.tobytes()
        gif += b"\x2C" + b"\x00" * 4 + w.to_bytes(2, "little") \
            + h.to_bytes(2, "little") + b"\x00" + bytes([min_code])
        for j in range(0, len(lzw), 255):
            blk = lzw[j:j + 255]
            gif += bytes([len(blk)]) + blk
        gif += b"\x00\x3B"
        got = decode_gif(bytes(gif))
        assert np.array_equal(got, pal[idx.astype(int)]), "real LZW"


def test_gif_interlaced():
    """Interlace flag: rows arrive in 4-pass order and must be
    de-scrambled back to raster order."""
    import numpy as np

    from dgraph_spark.operators.multimodal import decode_gif, encode_gif

    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    idx = (np.arange(13)[:, None] % 16 * np.ones(5, dtype=int)[None, :]
           ).astype(np.uint8)
    h = 13
    order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                            np.arange(2, h, 4), np.arange(1, h, 2)])
    scrambled = idx[order]            # rows in interlace transmit order
    gif = bytearray(encode_gif(scrambled, pal))
    # flip the interlace bit in the image descriptor (offset: header 6
    # + lsd 7 + gct 16*3 = 61; descriptor flags at 61 + 9)
    assert gif[61] == 0x2C
    gif[61 + 9] |= 0x40
    got = decode_gif(bytes(gif))
    assert np.array_equal(got, pal[idx.astype(int)])


def test_png_adam7_interlaced():
    """Independent FORWARD Adam7 interlacer (PNG spec §8.2, written
    from the spec): split the image into the 7 passes, filter each
    sub-image (mixing filter types), assemble — decode_png must
    de-interlace back to the exact raster."""
    import zlib

    import numpy as np

    from dgraph_spark.operators.multimodal import decode_png

    def chunk(typ, body):
        return (len(body).to_bytes(4, "big") + typ + body
                + (zlib.crc32(typ + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    passes = ((0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
              (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2))
    rng = np.random.default_rng(13)
    for h, w, channels, ct in ((13, 11, 3, 2), (9, 17, 1, 0),
                               (8, 8, 4, 6), (1, 1, 3, 2),
                               (3, 5, 2, 4)):
        img = rng.integers(0, 256, (h, w, channels)).astype(np.uint8)
        raw = b""
        for x0, dx, y0, dy in passes:
            sub = img[y0::dy, x0::dx]
            ph, pw = sub.shape[0], sub.shape[1]
            if ph == 0 or pw == 0:
                continue
            flat = sub.reshape(ph, pw * channels).astype(int)
            for y in range(ph):
                f = (y + x0) % 3      # mix filters 0/1/2 across rows
                line = flat[y]
                if f == 0:
                    filt = line
                elif f == 1:
                    left = np.concatenate(
                        [np.zeros(channels, int), line[:-channels]])
                    filt = line - left
                else:
                    prior = flat[y - 1] if y else np.zeros_like(line)
                    filt = line - prior
                raw += bytes([f]) + bytes((filt % 256).astype(np.uint8))
        ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + bytes((8, ct, 0, 0, 1)))
        png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
        got = decode_png(png)
        want = img[:, :, 0] if channels == 1 else img
        assert np.array_equal(got, want), (h, w, ct)


def test_png_16bit_decode():
    """Hand-assembled 16-bit gray + RGB PNGs (big-endian samples,
    filter 0 and filter 1 rows): decoder unfilters at byte granularity
    and returns the high byte of each sample."""
    import zlib

    import numpy as np

    from dgraph_spark.operators.multimodal import decode_png

    def chunk(typ, body):
        return (len(body).to_bytes(4, "big") + typ + body
                + (zlib.crc32(typ + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    rng = np.random.default_rng(11)
    for channels, ct in ((1, 0), (3, 2)):
        vals = rng.integers(0, 1 << 16, (4, 5, channels)).astype(">u2")
        raw = b""
        for y in range(4):
            line = vals[y].tobytes()
            if y % 2 == 0:
                raw += b"\x00" + line
            else:           # Sub filter at byte granularity
                arr = np.frombuffer(line, np.uint8).astype(int)
                bpp = channels * 2
                filt = arr.copy()
                filt[bpp:] = (arr[bpp:] - arr[:-bpp]) % 256
                raw += b"\x01" + bytes(filt.astype(np.uint8))
        ihdr = ((5).to_bytes(4, "big") + (4).to_bytes(4, "big")
                + bytes((16, ct, 0, 0, 0)))
        png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
        got = decode_png(png)
        want = (vals >> 8).astype(np.uint8)
        want = want[:, :, 0] if channels == 1 else want
        assert np.array_equal(got, want), ct


def test_tiff_roundtrip_and_packbits():
    """decode_tiff on the fixture encoder's streams: gray + RGB,
    uncompressed + PackBits, plus a hand-built big-endian variant and
    white-is-zero inversion."""
    import numpy as np

    from dgraph_spark.operators.multimodal import (_packbits, decode_tiff,
                                                   encode_tiff)

    rng = np.random.default_rng(20260816)
    gray = rng.integers(0, 256, (9, 14)).astype(np.uint8)
    rgb = rng.integers(0, 256, (7, 5, 3)).astype(np.uint8)
    # runs of equal bytes exercise PackBits run packing
    runs = np.repeat(np.arange(12, dtype=np.uint8), 17).reshape(12, 17)
    for img in (gray, rgb, runs):
        for pb in (False, True):
            got = decode_tiff(encode_tiff(img, packbits=pb))
            assert np.array_equal(got, img), (img.shape, pb)

    # independent PackBits vector (TIFF 6.0 spec §9 worked example):
    # FE AA | 02 80 00 2A | FD AA | 03 80 00 2A 22 | F7 AA
    spec_in = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    spec_out = (b"\xAA" * 3 + b"\x80\x00\x2A" + b"\xAA" * 4
                + b"\x80\x00\x2A\x22" + b"\xAA" * 10)
    assert _packbits(spec_in, len(spec_out)) == spec_out

    # big-endian (MM) + white-is-zero: build by byte-swapping the
    # little-endian fixture's multi-byte fields is fiddly; instead
    # hand-assemble a minimal 2x2 gray MM file
    w = h = 2
    raw = bytes([10, 20, 30, 40])
    ifd_off = 8 + len(raw)
    entries = [(256, 3, 1, w << 16), (257, 3, 1, h << 16),
               (258, 3, 1, 8 << 16), (259, 3, 1, 1 << 16),
               (262, 3, 1, 0 << 16),          # white-is-zero
               (273, 4, 1, 8), (277, 3, 1, 1 << 16),
               (278, 3, 1, h << 16), (279, 4, 1, len(raw))]
    ifd = len(entries).to_bytes(2, "big")
    for tag, typ, cnt, val in entries:
        ifd += (tag.to_bytes(2, "big") + typ.to_bytes(2, "big")
                + cnt.to_bytes(4, "big") + val.to_bytes(4, "big"))
    ifd += (0).to_bytes(4, "big")
    tif = b"MM\x00*" + ifd_off.to_bytes(4, "big") + raw + ifd
    got = decode_tiff(tif)
    assert np.array_equal(got, 255 - np.array([[10, 20], [30, 40]],
                                              dtype=np.uint8))

    import pytest as _pytest
    with _pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"JUNK" * 4)
    lzw = bytearray(encode_tiff(gray))
    # flip the compression tag value (259) to 5 (LZW)
    comp_at = lzw.find((259).to_bytes(2, "little") + (3).to_bytes(2, "little"))
    lzw[comp_at + 8] = 5
    with _pytest.raises(NotImplementedError, match="compression 5"):
        decode_tiff(bytes(lzw))


def test_jpeg_solid_exact_roundtrip():
    """Solid-value grayscale + QTABLE_EXACT (DC quant 8) round-trips
    BIT-EXACTLY through the full Huffman + IDCT path — the property the
    multimodal_jpeg oracle entry relies on (a flat block's only nonzero
    coefficient is DC = 8*(v-128), exactly divisible by the step)."""
    import numpy as np

    from dgraph_spark.operators.jpegcodec import (decode_jpeg,
                                                  encode_jpeg_gray)

    for v in (0, 7, 128, 129, 200, 255):
        for shape in ((13, 32), (8, 8), (1, 1), (97, 32)):
            img = np.full(shape, v, dtype=np.uint8)
            got = decode_jpeg(encode_jpeg_gray(img))
            assert got.shape == shape
            assert (got == v).all(), (v, shape)


def test_jpeg_gray_lossy_roundtrip_bounded():
    """Random grayscale through encode->decode stays within the error
    bound implied by the quantization table (coarse bound: the max
    per-sample reconstruction error of independently-rounded
    coefficients, sum(q)/2 spread across the orthonormal basis — use a
    generous empirical ceiling instead of the tight analytic one)."""
    import numpy as np

    from dgraph_spark.operators.jpegcodec import (decode_jpeg,
                                                  encode_jpeg_gray)

    rng = np.random.default_rng(20260816)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg_gray(img))
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 64


def test_jpeg_color_444_and_420_and_restart():
    """Color round-trips: 4:4:4 on a smooth gradient is near-exact;
    4:2:0 exercises chroma downsample/upsample; a 2-MCU restart
    interval exercises DRI/RSTn resync + DC predictor reset."""
    import numpy as np

    from dgraph_spark.operators.jpegcodec import (decode_jpeg,
                                                  encode_jpeg_color)

    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack([(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256],
                   axis=-1).astype(np.uint8)
    got = decode_jpeg(encode_jpeg_color(img, "444"))
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 24

    got = decode_jpeg(encode_jpeg_color(img, "420"))
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 48

    got_rst = decode_jpeg(encode_jpeg_color(img, "420",
                                            restart_interval=2))
    assert np.array_equal(got_rst,
                          decode_jpeg(encode_jpeg_color(img, "420")))

    # non-multiple-of-MCU dims: encoder pads, decoder must crop back
    odd = img[:21, :33]
    got = decode_jpeg(encode_jpeg_color(odd, "420"))
    assert got.shape == odd.shape


def test_jpeg_loud_rejections():
    import numpy as np
    import pytest as _pytest

    from dgraph_spark.operators.jpegcodec import (decode_jpeg,
                                                  encode_jpeg_gray)

    ok = encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8))
    # flip SOF0 (FFC0) into progressive SOF2 (FFC2)
    sof = ok.index(b"\xff\xc0")
    prog = ok[:sof] + b"\xff\xc2" + ok[sof + 2:]
    with _pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(prog)
    with _pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"JUNK" * 4)
    with _pytest.raises(ValueError, match="missing SOS"):
        decode_jpeg(b"\xff\xd8\xff\xd9")


def test_jpeg_media_table_matches_oracle(spark):
    """jpeg_table_from_docs -> extract_image_features recovers the
    closed-form stats (grayscale v = doc_id %% 256 replicated into all
    three channels) through the real entropy-coded bitstream."""
    from dgraph_spark.operators.multimodal import (
        extract_image_features, jpeg_table_from_docs)

    docs = spark.createDataFrame(
        [(i * 23, "x" * (i * 37 % 200 + 1)) for i in range(1, 13)],
        "doc_id long, text string").withColumn("n_chars",
                                               F.length("text"))
    rows = extract_image_features(jpeg_table_from_docs(docs)).collect()
    assert len(rows) == 12
    for r in rows:
        v = float(r["media_id"] % 256)
        assert r["width"] == 32
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (v, v, v), r


def test_flac_lossless_roundtrip():
    """encode_flac -> decode_flac is bit-exact (lossless codec):
    square waves, random noise (worst case for the fixed predictor),
    sine, stereo interleave, multi-frame streams, tiny inputs."""
    import numpy as np

    from dgraph_spark.operators.flaccodec import decode_flac, encode_flac

    rng = np.random.default_rng(20260816)
    cases = [
        (np.tile(np.array([777, -777], dtype=np.int64), 400), 1, 4096),
        (rng.integers(-32768, 32768, 10000, dtype=np.int64), 1, 2048),
        (rng.integers(-32768, 32768, 2 * 4396, dtype=np.int64), 2, 4096),
        ((3000 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000))
         .astype(np.int64), 1, 4096),
        (np.array([100], dtype=np.int64), 1, 4096),
        (np.array([100, -200], dtype=np.int64), 1, 4096),
        (np.zeros(500, dtype=np.int64), 1, 4096),
    ]
    for samples, ch, bs in cases:
        rate, got_ch, got = decode_flac(
            encode_flac(samples, 8000, ch, blocksize=bs))
        assert rate == 8000 and got_ch == ch
        assert np.array_equal(got, samples), (ch, bs, len(samples))


def test_flac_crc_and_rejections():
    import numpy as np
    import pytest as _pytest

    from dgraph_spark.operators.flaccodec import decode_flac, encode_flac

    ok = encode_flac(np.arange(100, dtype=np.int64), 8000, 1)
    # flip the stored frame CRC-16 (last two bytes of the stream)
    corrupt = bytearray(ok)
    corrupt[-1] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(corrupt))
    with _pytest.raises(NotImplementedError, match="Ogg"):
        decode_flac(b"OggS" + b"\x00" * 32)
    with _pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"JUNK" * 8)


def test_flac_media_table_matches_wav(spark):
    """flac_table_from_docs decodes to the SAME audio features as
    audio_table_from_docs (same samples, lossless codec underneath)."""
    from dgraph_spark.operators.multimodal import (
        audio_table_from_docs, extract_audio_features,
        flac_table_from_docs)

    docs = spark.createDataFrame(
        [(i * 23, "x" * (i * 37 % 200 + 1)) for i in range(1, 13)],
        "doc_id long, text string").withColumn("n_chars",
                                               F.length("text"))
    cols = ["media_id", "sample_rate", "channels", "n_samples", "rms"]
    a = {tuple(r) for r in extract_audio_features(
        audio_table_from_docs(docs)).select(cols).collect()}
    b = {tuple(r) for r in extract_audio_features(
        flac_table_from_docs(docs)).select(cols).collect()}
    assert a == b and len(a) == 12


def test_mp4_meta_parse():
    """parse_mp4_meta on the fixture builder AND on hand-tweaked
    variants: mvhd version 1 (64-bit duration), 64-bit box largesize,
    multi-track, and loud rejection of non-BMFF payloads."""
    import numpy as np

    from dgraph_spark.operators.multimodal import (_mp4_box, build_mp4,
                                                   parse_mp4_meta)

    dur, w, h, nt = parse_mp4_meta(build_mp4(12.3, 640, 480))
    assert (round(dur, 6), w, h, nt) == (12.3, 640, 480, 1)

    dur, w, h, nt = parse_mp4_meta(build_mp4(0.5, 1920, 1080,
                                             n_tracks=3))
    assert (dur, w, h, nt) == (0.5, 1920, 1080, 3)

    # mvhd version 1: 64-bit creation/modification/duration
    scale, d64 = 90000, 90000 * 7
    mvhd = (b"\x01" + b"\x00" * 3 + b"\x00" * 16
            + scale.to_bytes(4, "big") + d64.to_bytes(8, "big")
            + b"\x00" * 80)
    payload = (_mp4_box(b"ftyp", b"isom\x00\x00\x02\x00")
               + _mp4_box(b"moov", _mp4_box(b"mvhd", mvhd)))
    dur, w, h, nt = parse_mp4_meta(payload)
    assert (dur, nt) == (7.0, 0)

    # 64-bit largesize box wrapping moov
    moov_body = _mp4_box(b"mvhd", (b"\x00" + b"\x00" * 3 + b"\x00" * 8
                                   + (1000).to_bytes(4, "big")
                                   + (2500).to_bytes(4, "big")
                                   + b"\x00" * 80))
    big = ((1).to_bytes(4, "big") + b"moov"
           + (16 + len(moov_body)).to_bytes(8, "big") + moov_body)
    payload = _mp4_box(b"ftyp", b"isom") + big
    dur, _, _, _ = parse_mp4_meta(payload)
    assert dur == 2.5

    import pytest as _pytest
    with _pytest.raises(ValueError, match="ftyp"):
        parse_mp4_meta(b"RIFFxxxxWAVE")
    with _pytest.raises(ValueError, match="overruns"):
        bad = _mp4_box(b"ftyp", b"isom") + (999).to_bytes(4, "big") + b"moov"
        parse_mp4_meta(bad + b"\x00" * 4)


def test_video_media_table(spark):
    """video_table_from_docs -> extract_video_metadata recovers the
    closed-form id-keyed container metadata."""
    from dgraph_spark.operators.multimodal import (extract_video_metadata,
                                                   video_table_from_docs)

    docs = spark.createDataFrame(
        [(i * 23, "x" * (i * 37 % 200 + 1)) for i in range(1, 13)],
        "doc_id long, text string").withColumn("n_chars",
                                               F.length("text"))
    rows = extract_video_metadata(video_table_from_docs(docs)).collect()
    assert len(rows) == 12
    for r in rows:
        d = r["media_id"]
        nch = (d // 23) * 37 % 200 + 1
        assert r["width"] == 16 * (d % 90 + 1)
        assert r["height"] == 16 * (d % 50 + 1)
        assert r["n_tracks"] == 1
        assert abs(r["duration_s"] - (nch % 600) / 10.0) < 1e-9


def test_robots_parse_and_filter(spark):
    """RFC 9309 semantics end-to-end: group selection, wildcard and
    end-anchor patterns, longest-match with allow-wins ties, and the
    no-rules / no-robots default-allow paths."""
    from dgraph_spark.operators.robots import (parse_robots, robots_filter,
                                               robots_rules)

    txt = ("User-agent: special\nDisallow: /\n\n"
           "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
           "Disallow: /tmp/*\nAllow: /tmp/keep$\n"
           "Allow: /private/x\nDisallow: /private/x\n")  # tie: allow wins
    assert [(r["allow"], r["pattern"]) for r in
            parse_robots(txt, agent="special")] == [(False, "/")]

    robots = spark.createDataFrame(
        [("a.com", txt), ("empty.com", "")],
        "domain string, robots_txt string")
    urls = spark.createDataFrame(
        [(1, "a.com", "/pub"), (2, "a.com", "/private/y"),
         (3, "a.com", "/private/ok/z"), (4, "a.com", "/tmp/any"),
         (5, "a.com", "/tmp/keep"), (6, "a.com", "/private/x"),
         (7, "empty.com", "/anything"), (8, "norobots.com", "/x")],
        "doc_id long, domain string, path string")
    got = {r["doc_id"]: r["allowed"] for r in
           robots_filter(urls, robots_rules(robots)).collect()}
    assert got == {1: True, 2: False, 3: True, 4: False, 5: True,
                   6: True, 7: True, 8: True}


def test_sitemap_parse(spark):
    """parse_sitemap on namespaced urlsets, namespace-less documents,
    sitemapindex recursion flags, and malformed XML."""
    import pytest as _pytest

    from dgraph_spark.operators.robots import parse_sitemap, sitemap_urls

    ns = ('<?xml version="1.0"?><urlset xmlns='
          '"http://www.sitemaps.org/schemas/sitemap/0.9">'
          "<url><loc>http://a.com/1</loc><lastmod>2026-01-02</lastmod>"
          "<changefreq>daily</changefreq><priority>0.8</priority></url>"
          "<url><loc>http://a.com/2</loc></url></urlset>")
    got = parse_sitemap(ns)
    assert [r["loc"] for r in got] == ["http://a.com/1", "http://a.com/2"]
    assert got[0]["changefreq"] == "daily" and got[1]["lastmod"] is None
    assert not got[0]["is_index"]

    plain = ("<urlset><url><loc>http://b.com/x</loc></url>"
             "<url><junk/></url></urlset>")       # entry without loc skipped
    assert [r["loc"] for r in parse_sitemap(plain)] == ["http://b.com/x"]

    index = ('<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
             'sitemap/0.9"><sitemap><loc>http://a.com/s1.xml</loc>'
             "</sitemap></sitemapindex>")
    (rec,) = parse_sitemap(index)
    assert rec["is_index"] and rec["loc"] == "http://a.com/s1.xml"

    with _pytest.raises(ValueError, match="parse error"):
        parse_sitemap("<urlset><url></urlset>")
    with _pytest.raises(ValueError, match="not a sitemap"):
        parse_sitemap("<html></html>")

    maps = spark.createDataFrame([("a.com", ns), ("b.com", plain)],
                                 "domain string, sitemap_xml string")
    rows = sitemap_urls(maps).collect()
    assert {(r["domain"], r["loc"]) for r in rows} == {
        ("a.com", "http://a.com/1"), ("a.com", "http://a.com/2"),
        ("b.com", "http://b.com/x")}


def test_warc_parse_and_read(spark, tmp_path):
    """build_warc -> parse_warc_bytes round-trip (gzipped multi-member
    and plain), HTTP header split, and the Spark binaryFile-backed
    read_warc over a directory of .warc.gz files."""
    from dgraph_spark.sources.warc import (build_warc, parse_warc_bytes,
                                           read_warc)

    recs = [
        {"warc_type": "warcinfo", "target_uri": "",
         "content_type": "application/warc-fields",
         "payload": b"software: test\r\n"},
        {"warc_type": "response", "target_uri": "http://a.com/x",
         "content_type": "text/html", "http_status": 200,
         "payload": b"<html>hello</html>"},
        {"warc_type": "request", "target_uri": "http://a.com/x",
         "content_type": "application/http;msgtype=request",
         "payload": b"GET /x HTTP/1.1\r\n\r\n"},
        {"warc_type": "response", "target_uri": "http://a.com/404",
         "content_type": "text/html", "http_status": 404,
         "payload": b"gone"},
    ]
    for gz in (True, False):
        got = parse_warc_bytes(build_warc(recs, gzipped=gz))
        assert [r["warc_type"] for r in got] == \
            ["warcinfo", "response", "request", "response"]
        assert got[1]["http_status"] == 200
        assert got[1]["payload"] == b"<html>hello</html>"  # HTTP split
        assert got[2]["http_status"] is None
        assert got[3]["http_status"] == 404
        assert got[3]["payload"] == b"gone"

    # two files through the Spark reader
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(build_warc(recs[:2]))
    (d / "b.warc.gz").write_bytes(build_warc(recs[2:]))
    df = read_warc(spark, str(d))
    rows = df.collect()
    assert len(rows) == 4
    by_uri = sorted((r["warc_type"], r["target_uri"]) for r in rows)
    assert ("response", "http://a.com/404") in by_uri
    statuses = {r["target_uri"]: r["http_status"] for r in rows
                if r["warc_type"] == "response"}
    assert statuses == {"http://a.com/x": 200, "http://a.com/404": 404}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="version line"):
        parse_warc_bytes(b"NOTWARC/1.1\r\n\r\n\r\n\r\n")
    with _pytest.raises(ValueError, match="truncated"):
        parse_warc_bytes(
            b"WARC/1.1\r\nWARC-Type: response\r\n"
            b"Content-Length: 999\r\n\r\nshort")


def test_canonical_url_cases(spark):
    """Documented canonicalization contract, case by case."""
    from dgraph_spark.operators.urls import canonical_url

    cases = [
        ("HTTP://EXAMPLE.com:80/A/B?z=1&a=2#frag",
         "http://example.com/A/B?a=2&z=1"),
        ("https://Host.COM:443", "https://host.com/"),
        ("https://host.com:8443/x", "https://host.com:8443/x"),  # non-default port kept
        ("http://h.com/p?utm_source=a&utm_medium=b&fbclid=c&gclid=d",
         "http://h.com/p"),
        ("http://h.com/p?b=2&a=1&utm_campaign=x&msclkid=9",
         "http://h.com/p?a=1&b=2"),
        ("ftp://Files.Example.com/Pub", "ftp://files.example.com/Pub"),
        ("http://h.com?a=1", "http://h.com/?a=1"),  # empty path -> /
        ("not a url at all", "not a url at all"),   # passthrough
        ("relative/path?x=1", "relative/path?x=1"), # no scheme
        ("http://h.com/p?a=1&&b=2", "http://h.com/p?a=1&b=2"),  # empty param
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(canonical_url("url")).collect()]
    for (u, want), g in zip(cases, got):
        assert g == want, (u, g, want)


def test_url_dedup(spark):
    """url_dedup keeps one row per canonical form, min-url rep."""
    from dgraph_spark.operators.urls import url_dedup

    df = spark.createDataFrame(
        [("HTTP://A.com:80/x?b=1&a=2&utm_source=s",),
         ("http://a.com/x?a=2&b=1",),
         ("http://a.com/x?a=2&b=1#frag",),
         ("http://b.com/y",)], "url string")
    kept = url_dedup(df, "url").collect()
    assert len(kept) == 2
    by_canon = {r["canonical_url"]: r["url"] for r in kept}
    assert by_canon["http://a.com/x?a=2&b=1"] == \
        "HTTP://A.com:80/x?b=1&a=2&utm_source=s"  # min() of the three
    assert "http://b.com/y" in by_canon


def test_html_extract_messy():
    """extract_text_py on adversarial real-world shapes: unclosed
    tags, nested skip-subtrees, entities, attribute soup, link-dense
    blocks dropped, empty/None input."""
    from dgraph_spark.operators.htmlextract import extract_text_py

    txt, nb, nl, dens = extract_text_py(
        '<div class="a" data-x="<p>">Real <b>content</b> here'
        "<script>document.write('<p>fake</p>')</script>"
        "<div>more text</div>")
    assert txt == "Real content here more text"
    assert nb == 2 and nl == 0

    # nav chrome dropped by link density, its links still counted
    txt, nb, nl, _ = extract_text_py(
        '<ul><li><a href="/1">one</a></li><li><a href="/2">two</a></li>'
        "</ul><p>body text stays</p>")
    assert txt == "body text stays" and nl == 2

    # entities + an in-sentence anchor + unclosed <p>
    txt, _, nl, _ = extract_text_py(
        "<p>a &lt;tag&gt; &amp; more<p>second paragraph with plenty of "
        'surrounding prose so that the <a href="x">short link</a> stays '
        "well under the link-density threshold and the block is kept</p>")
    assert "a <tag> & more" in txt and "second paragraph" in txt
    assert "short link" in txt  # low density: kept
    assert nl == 1

    # style/noscript/template subtrees vanish
    txt, _, _, _ = extract_text_py(
        "<style>.x{content:'hi'}</style><noscript>no js</noscript>"
        "<template><p>tpl</p></template><p>visible</p>")
    assert txt == "visible"

    assert extract_text_py("") == ("", 0, 0, 0.0)
    assert extract_text_py(None) == ("", 0, 0, 0.0)

    # all-link document: everything dropped, density 1.0
    txt, nb, nl, dens = extract_text_py('<a href="/x">only link</a>')
    assert txt == "" and nl == 1 and dens == 1.0


def test_html_extract_spark_roundtrip(spark):
    """html_table_from_docs wraps text in a page with chrome; the
    extractor recovers the collapsed text and closed-form counts."""
    from dgraph_spark.operators.htmlextract import (html_extract,
                                                    html_table_from_docs)

    docs = spark.createDataFrame(
        [(7, "alpha beta <gamma> & delta " * 5),
         (12, "one\ntwo\tthree  four"),
         (13, "")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            html_extract(html_table_from_docs(docs)).collect()}
    assert rows[7]["text"] == ("alpha beta <gamma> & delta " * 5).strip()
    assert rows[7]["n_links"] == 7 % 5 + 2
    assert rows[12]["text"] == "one two three four"
    assert rows[12]["n_blocks"] == 1
    assert rows[13]["text"] == "" and rows[13]["n_blocks"] == 0


def test_codec_corruption_fuzz():
    """A 100 TB crawl always contains corrupt files: every decoder,
    fed random single-byte flips and truncations of valid fixtures,
    must either succeed or raise ValueError/NotImplementedError — no
    IndexError/zlib.error/KeyError leaks, no unbounded work from
    corrupt headers (dimension/inflate guards)."""
    import signal

    import numpy as np

    from dgraph_spark.operators.flaccodec import encode_flac
    from dgraph_spark.operators.jpegcodec import (encode_jpeg_color,
                                                  encode_jpeg_gray)
    from dgraph_spark.operators.multimodal import (_decode_audio_bytes,
                                                   _decode_image_bytes,
                                                   encode_gif, encode_png,
                                                   encode_tiff)

    rng = np.random.default_rng(20260817)
    img = rng.integers(0, 256, (9, 12, 3)).astype(np.uint8)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (9, 12)).astype(np.uint8)
    samples = rng.integers(-3000, 3000, 500, dtype=np.int64)
    wav_fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
               + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
               + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    wav_data = samples.astype("<i2").tobytes()
    wav = (b"RIFF" + (36 + len(wav_data)).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little") + wav_fmt
           + b"data" + len(wav_data).to_bytes(4, "little") + wav_data)
    fixtures = [
        (_decode_image_bytes, b"P6\n12 9\n255\n" + img.tobytes()),
        (_decode_image_bytes, encode_png(img)),
        (_decode_image_bytes, encode_jpeg_gray(img[:, :, 0])),
        (_decode_image_bytes, encode_jpeg_color(img, "420")),
        (_decode_image_bytes, encode_gif(idx, pal)),
        (_decode_image_bytes, encode_tiff(img, packbits=True)),
        (_decode_audio_bytes, wav),
        (_decode_audio_bytes, encode_flac(samples, 8000, 1)),
    ]

    def alarm(sig, frm):
        raise AssertionError("decoder hung on corrupt input")

    old = signal.signal(signal.SIGALRM, alarm)
    try:
        for decode, blob in fixtures:
            for _ in range(120):
                b = bytearray(blob)
                k = int(rng.integers(0, len(b)))
                b[k] ^= int(rng.integers(1, 256))
                signal.alarm(20)
                try:
                    decode(bytes(b))
                except (ValueError, NotImplementedError):
                    pass
                finally:
                    signal.alarm(0)
            for _ in range(40):       # truncations
                cut = int(rng.integers(0, len(blob)))
                signal.alarm(20)
                try:
                    decode(bytes(blob[:cut]))
                except (ValueError, NotImplementedError):
                    pass
                finally:
                    signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)


def test_extract_features_on_error_skip(spark):
    """on_error='skip' drops corrupt blobs instead of failing the job;
    on_error='raise' (the default, oracle mode) propagates."""
    import pytest as _pytest

    from dgraph_spark.operators.multimodal import (encode_png,
                                                   extract_audio_features,
                                                   extract_image_features)
    import numpy as np

    good = encode_png(np.full((4, 4, 3), 7, dtype=np.uint8))
    bad = good[:20] + bytes([good[20] ^ 0xFF]) + good[21:]  # CRC break
    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad)),
         (3, bytearray(b"GIF89a\x00\x00"))],
        "media_id long, media binary")
    kept = extract_image_features(media, on_error="skip").collect()
    assert [r["media_id"] for r in kept] == [1]
    with _pytest.raises(Exception):
        extract_image_features(media).collect()

    audio = spark.createDataFrame(
        [(1, bytearray(b"fLaCjunkjunkjunk"))], "media_id long, media binary")
    assert extract_audio_features(audio, on_error="skip").count() == 0
    with _pytest.raises(ValueError, match="on_error"):
        extract_image_features(media, on_error="null")


def test_multimodal_audio_features(spark):
    import numpy as np

    from dgraph_spark.operators.multimodal import extract_audio_features

    samples = np.array([3000, -3000] * 100, dtype="<i2")
    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (16000).to_bytes(4, "little") + (32000).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    wav = (b"RIFF" + (36 + 400).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little") + fmt
           + b"data" + (400).to_bytes(4, "little") + samples.tobytes())
    media = spark.createDataFrame([(1, bytearray(wav))],
                                  "media_id long, media binary")
    row = extract_audio_features(media).collect()[0]
    assert row["sample_rate"] == 16000 and row["channels"] == 1
    assert row["n_samples"] == 200 and abs(row["rms"] - 3000.0) < 1e-9


def test_near_dup_clusters_planted(spark):
    """Planted near-dup groups collapse into clusters labeled by their
    minimum member with exactly one keep per cluster."""
    from dgraph_spark.operators.dedup import near_dup_clusters

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (10, "completely different text about spark engines and scale"),
        (11, "completely different text about spark engines and scale!"),
        (20, "a singleton document with nothing else like it at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: (r["cluster"], r["keep"])
           for r in near_dup_clusters(docs, threshold=0.6).collect()}
    assert out[1] == (1, True) and out[2] == (1, False) and out[3] == (1, False)
    assert out[10] == (10, True) and out[11] == (10, False)
    assert 20 not in out  # singletons are not clusters


def test_embedding_all_pairs_guard(spark, monkeypatch):
    """Unblocked embedding_near_dups must refuse above ALL_PAIRS_ROW_CAP
    instead of launching an O(n^2) cross join."""
    from dgraph_spark.operators import dedup

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    monkeypatch.setattr(dedup, "ALL_PAIRS_ROW_CAP", 10)
    with pytest.raises(ValueError, match="ALL_PAIRS_ROW_CAP"):
        dedup.embedding_near_dups(emb, threshold=0.9)


def test_embedding_lsh_recall_vs_exact(spark):
    """Hyperplane-LSH candidate generation (the unblocked 100 TB path)
    must keep recall >= 0.9 vs the exact all-pairs set at t=0.9, with
    precision 1 (candidates are exactly verified)."""
    from dgraph_spark.operators.dedup import (
        embedding_near_dups,
        embedding_near_dups_lsh,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    exact = {(r["i"], r["j"]): r["cos"]
             for r in embedding_near_dups(emb, threshold=0.9).collect()}
    lsh = {(r["i"], r["j"]): r["cos"]
           for r in embedding_near_dups_lsh(emb, threshold=0.9).collect()}
    assert set(lsh) <= set(exact)          # precision 1 by exact verify
    assert len(lsh) >= 0.9 * len(exact), (len(lsh), len(exact))
    for k, v in lsh.items():
        assert abs(v - exact[k]) < 1e-6


def test_chunk_documents(spark):
    from dgraph_spark.operators.pipeline_text import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(130))),
         (2, "short text"),
         (3, "")],
        "doc_id long, text string")
    rows = chunk_documents(docs, window=64, overlap=16).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 130 tokens, stride 48: starts 0,48,96 -> 3 chunks of 64,64,34
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["n_tokens"] for r in c1] == [64, 64, 34]
    assert c1[0]["chunk"].startswith("w0 ") and c1[1]["chunk"].startswith("w48 ")
    # every token is covered, overlaps included
    assert c1[2]["chunk"].endswith("w129")
    # short doc: one whole chunk; empty doc: one empty chunk
    assert [r["n_tokens"] for r in by_doc[2]] == [2]
    assert [r["n_tokens"] for r in by_doc[3]] == [0]


def test_scrub_pii(spark):
    import pyspark.sql.functions as F

    from dgraph_spark.operators.pipeline_text import scrub_pii

    df = spark.createDataFrame(
        [("mail a.b+c@ex-site.org, call +44 20 7946 0958, "
          "see https://x.y/z?a=1 end",)], "t string")
    out = df.select(scrub_pii(F.col("t")).alias("s")).collect()[0]["s"]
    assert "<EMAIL>" in out and "<PHONE>" in out and "<URL>" in out
    assert "@" not in out and "http" not in out


def test_sample_stratified_and_decontaminate(spark):
    import pyspark.sql.functions as F

    from dgraph_spark.operators.pipeline_text import (decontaminate,
                                                      sample_stratified)

    docs = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", f"tok{i} x y z common tail {i}")
         for i in range(40)],
        "doc_id long, source string, text string")
    samp = sample_stratified(docs, stratum_col="source", cap=5)
    cnt = {r["source"]: r["n"] for r in
           samp.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert cnt == {"a": 5, "b": 5}
    # deterministic across calls
    ids1 = sorted(r["doc_id"] for r in samp.collect())
    ids2 = sorted(r["doc_id"] for r in
                  sample_stratified(docs, "source", 5).collect())
    assert ids1 == ids2

    # every doc shares the 3-gram "common tail <i>"? no — tails differ
    # by i; they DO share "x y z" -> everything is contaminated by any
    # bench doc, so decontaminate must drop all but nothing survives
    bench = docs.where(F.col("doc_id") == 0)
    clean = decontaminate(docs, bench, n=3)
    assert clean.count() == 0
    # disjoint bench -> nothing dropped
    bench2 = spark.createDataFrame(
        [(999, "zz", "totally different words entirely")],
        "doc_id long, source string, text string")
    assert decontaminate(docs, bench2, n=3).count() == 40


def test_duplicate_spans_planted(spark):
    from dgraph_spark.operators.dedup import duplicate_spans

    span = "a b c d e f g h i j"          # 10 shared tokens
    df = spark.createDataFrame(
        [
            (1, f"start {span} end"),
            (2, f"other prefix {span}"),           # same span, doc 2
            (3, f"{span} tail {span}"),            # twice within doc 3
            (4, "nothing shared here at all with anyone else today ok"),
        ],
        "doc_id long, text string",
    )
    out = {r["span"]: r for r in duplicate_spans(df, n=10).collect()}
    assert span in out
    assert out[span]["n_docs"] == 3
    assert out[span]["n_occ"] == 4
    # every other window occurs in exactly one document
    assert set(out) == {span}
    # short docs (< n tokens) contribute nothing and don't error
    short = spark.createDataFrame([(9, "too short")],
                                  "doc_id long, text string")
    assert duplicate_spans(short, n=10).count() == 0


def test_repetition_stats_hand_computed(spark):
    from dgraph_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "spam spam spam eggs"),
            (2, "all distinct tokens here"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    r1 = rows[1]
    assert r1["n_tokens"] == 4
    assert r1["dup_token_frac"] == 0.5          # 1 - 2/4
    assert r1["top_token_frac"] == 0.75         # spam x3 / 4
    # bigrams: "spam spam" x2, "spam eggs" x1 -> top covers 2*9 chars
    # of len("spam spam spam eggs") = 19
    assert r1["top_bigram_char_frac"] == round(2 * 9 / 19, 4)
    r2 = rows[2]
    assert r2["dup_token_frac"] == 0.0
    assert r2["top_token_frac"] == 0.25
    r3 = rows[3]
    assert (r3["n_tokens"], r3["dup_token_frac"],
            r3["top_bigram_char_frac"]) == (0, 0.0, 0.0)


def test_pack_sequences_offsets(spark):
    from dgraph_spark.operators.pipeline_text import pack_sequences

    mk = lambda n: " ".join(["w"] * n)
    df = spark.createDataFrame(
        [
            (1, "a", mk(5)),
            (2, "a", mk(6)),    # crosses the 8-token boundary: [5, 11)
            (3, "a", ""),       # empty doc pinned at its offset
            (4, "b", mk(3)),    # independent stream per stratum
        ],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in pack_sequences(df, budget=8).collect()}
    assert (out[1]["tok_offset"], out[1]["first_seq"], out[1]["last_seq"]) \
        == (0, 0, 0)
    assert (out[2]["tok_offset"], out[2]["first_seq"], out[2]["last_seq"]) \
        == (5, 0, 1)
    assert (out[3]["tok_offset"], out[3]["first_seq"], out[3]["last_seq"]) \
        == (11, 1, 1)
    assert (out[4]["tok_offset"], out[4]["first_seq"], out[4]["last_seq"]) \
        == (0, 0, 0)


def test_gopher_quality_filter_rules(spark):
    from dgraph_spark.operators.textstats import gopher_quality_filter

    good = "the quick brown fox jumps over one lazy dog while " \
           "seventeen other animals watch quietly from nearby hills today"
    df = spark.createDataFrame(
        [
            (1, good),                                   # passes all rules
            (2, "short doc"),                            # too_few_tokens
            (3, "spam " * 40),                           # dup + top token/bigram
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_quality_filter(df).collect()}
    assert rows[1]["keep"] and rows[1]["reasons"] == []
    assert not rows[2]["keep"]
    assert "too_few_tokens" in rows[2]["reasons"]
    assert not rows[3]["keep"]
    assert {"dup_tokens", "top_token", "top_bigram"} <= set(rows[3]["reasons"])
    # reasons preserve GOPHER_RULES order
    assert rows[3]["reasons"] == sorted(
        rows[3]["reasons"],
        key=["too_few_tokens", "too_many_tokens", "dup_tokens",
             "top_token", "top_bigram"].index)


def test_semantic_dedup_clusters(spark):
    from dgraph_spark.operators.dedup import semantic_dedup

    # block 0: 1~2 and 2~3 chained (transitive cluster of 3), 4 isolated;
    # block 1: identical pair (5, 6)
    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.9, 0.435, 0.0], 0),   # cos(1,2)≈0.90, cos(2,3)≈0.44
        (3, [0.0, 1.0, 0.0], 0),
        (4, [0.0, 0.0, 1.0], 0),
        (5, [0.5, 0.5, 0.0], 1),
        (6, [0.5, 0.5, 0.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["id"]: r for r in
           semantic_dedup(df, threshold=0.8, block_col="label").collect()}
    assert set(out) == {1, 2, 5, 6}          # 3 not within 0.8 of 2; 4 isolated
    assert out[1]["cluster"] == 1 and out[1]["keep"]
    assert out[2]["cluster"] == 1 and not out[2]["keep"]
    assert out[5]["keep"] and not out[6]["keep"]
    # lower threshold chains 3 into the cluster transitively
    out2 = {r["id"]: r["cluster"] for r in
            semantic_dedup(df, threshold=0.4, block_col="label").collect()}
    assert out2[3] == 1


def test_contamination_scores_hand_computed(spark):
    from dgraph_spark.operators.pipeline_text import contamination_scores

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),        # grams: abc bcd cde
            (2, "x y z a b c"),      # grams: xyz yza zab abc -> 1/4 match
            (3, "q r"),              # too short: 0 grams
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           contamination_scores(docs, bench, n=3).collect()}
    assert (out[1]["n_grams"], out[1]["matched"], out[1]["overlap_frac"]) \
        == (3, 1, round(1 / 3, 4))
    assert (out[2]["n_grams"], out[2]["matched"], out[2]["overlap_frac"]) \
        == (4, 1, 0.25)
    assert (out[3]["n_grams"], out[3]["matched"], out[3]["overlap_frac"]) \
        == (0, 0, 0.0)


def test_corpus_report(spark):
    from dgraph_spark.operators.pipeline_text import corpus_report

    docs = spark.createDataFrame(
        [
            (1, "web", "en", "one two three"),
            (2, "web", "fr", "quatre cinq"),
            (3, "book", "en", "six"),
        ],
        "doc_id long, source string, lang string, text string",
    )
    out = {r["source"]: r for r in corpus_report(docs).collect()}
    assert (out["web"]["n_docs"], out["web"]["n_tokens"],
            out["web"]["mean_tokens"], out["web"]["n_langs"]) == (2, 5, 2.5, 2)
    assert (out["book"]["n_docs"], out["book"]["n_tokens"],
            out["book"]["n_langs"]) == (1, 1, 1)


def test_filterable_outputs_stay_single_pass_under_pushdown(spark):
    """Regression pin for the round-9 pushdown blowup (PLANS.md):
    filtering on a computed keep/quality column must NOT inline a
    copy of the tokenizer per rule reference. Before the let-binding
    fix the pushed quality predicate contained 25 split( sites (48 s
    at sf0.1); the bound expressions keep it at <= a handful (one per
    surviving expression copy, each internally single-pass)."""
    from dgraph_spark.operators.pipeline_text import c4_line_clean
    from dgraph_spark.operators.textstats import (
        gopher_quality_filter, text_stats)

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today ok")],
        "doc_id long, text string")

    def splits(df):
        return df._jdf.queryExecution().executedPlan().toString().count(
            "split(")

    assert splits(gopher_quality_filter(docs).where("keep")) <= 4
    assert splits(text_stats(docs).where("quality > 0.5")) <= 4
    assert splits(c4_line_clean(docs).where("keep")) <= 6


def test_line_repetition_stats(spark):
    from dgraph_spark.operators.textstats import line_repetition_stats

    df = spark.createDataFrame(
        [(1, "aaa\naaa\nbbb"),       # one dup line: frac 1/3, chars 3/9
         (2, "x\n\n  \ny"),          # blank/ws lines dropped
         (3, ""),                    # empty doc -> all zeros
         (5, "dup\ndup\ndup\nuniq")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_repetition_stats(df).collect()}
    assert (out[1]["n_lines"], out[1]["dup_line_frac"],
            out[1]["dup_line_char_frac"]) == (3, 0.3333, 0.3333)
    assert out[2]["n_lines"] == 2 and out[2]["dup_line_frac"] == 0.0
    assert (out[3]["n_lines"], out[3]["dup_line_frac"]) == (0, 0.0)
    # doc 5: 4 lines, 2 distinct -> 0.5; dup chars 2*3=6 of 13 -> 0.4615
    assert (out[5]["dup_line_frac"], out[5]["dup_line_char_frac"]) \
        == (0.5, 0.4615)


def test_blocklist_filter(spark):
    from dgraph_spark.operators.textstats import blocklist_filter

    df = spark.createDataFrame(
        [(1, "a BAD word here"), (2, "all clean"), (3, "bad and worse")],
        "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in blocklist_filter(df, ["bad", "WORSE"]).collect()}
    assert (out[1]["keep"], out[1]["n_hits"]) == (False, 1)
    assert (out[2]["keep"], out[2]["n_hits"]) == (True, 0)
    assert (out[3]["keep"], out[3]["n_hits"]) == (False, 2)
    with pytest.raises(ValueError, match="empty blocklist"):
        blocklist_filter(df, [])
