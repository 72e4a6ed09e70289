"""Operator-API tests with PLANTED near-duplicates — proves the dedup /
similarity operators actually find what they claim to find (the fixture
corpus has no duplicates, so oracle parity alone can't show recall)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ida_ice_energy_simulation_etl_pipeline_spark.operators.dedup import (
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    with_minhash_signature,
)
from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    documents_as_media,
    extract_features,
    frame_sample,
    resize_bytes,
    resize_image,
    sample_frames,
)
from ida_ice_energy_simulation_etl_pipeline_spark.operators.similarity import (
    lsh_topk,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the old oak tree "
    "near the quiet river bank where children play every sunny afternoon"
)


@pytest.fixture(scope="module")
def planted_docs(spark):
    """Corpus with known structure:
    0: base document
    1: exact copy of 0
    2: near-dup of 0 (one word changed)
    3: moderately similar (shares a clause)
    4,5: unrelated
    """
    rows = [
        (0, BASE, "src0"),
        (1, BASE, "src1"),
        (2, BASE.replace("lazy", "sleepy"), "src0"),
        (3, "the quick brown fox jumps over the fence " + "x y z " * 20, "src2"),
        (4, "completely different content about spark query engines " * 5, "src1"),
        (5, "unrelated words concerning database systems and storage " * 5, "src2"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_minhash_signature_identical_for_exact_dup(planted_docs):
    sig = with_minhash_signature(planted_docs).collect()
    by_id = {r["doc_id"]: [r[f"mh_{i}"] for i in range(8)] for r in sig}
    assert by_id[0] == by_id[1]  # exact copy: identical signature
    shared_02 = sum(a == b for a, b in zip(by_id[0], by_id[2]))
    shared_04 = sum(a == b for a, b in zip(by_id[0], by_id[4]))
    assert shared_02 > shared_04  # near-dup shares more minhashes than unrelated


def test_lsh_finds_planted_dups(planted_docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared_bands"]
        for r in lsh_candidate_pairs(planted_docs).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 4  # exact dup: all bands agree
    assert (0, 2) in pairs  # near-dup caught by at least one band
    assert (0, 4) not in pairs and (4, 5) not in pairs  # unrelated don't collide


def test_ngram_jaccard_scores(planted_docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(planted_docs, threshold=0.1).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical shingle sets
    assert 0.5 < pairs[(0, 2)] < 1.0  # one word changed → high but < 1
    assert (0, 4) not in pairs


def test_ngram_jaccard_df_cap_kills_hot_shingle(spark):
    # A corpus-wide boilerplate sentence puts every doc in one posting
    # list: uncapped, the inverted-index self-join materializes C(42,2)
    # pairs from boilerplate alone.  With the df cap the hot shingles are
    # dropped before the join, so the ONLY pair that survives even at
    # threshold 0 is the genuinely near-duplicate one — the join stays
    # sub-quadratic no matter how common the boilerplate is.
    boiler = "all rights reserved contact us for full terms of use today"
    rows = []
    for i in range(40):
        unique = " ".join(f"tok{i}x{j}" for j in range(20))
        rows.append((i, boiler + " " + unique, "s"))
    body = " ".join(f"dup{j}" for j in range(30))
    rows.append((100, boiler + " " + body, "s"))
    rows.append((101, boiler + " " + body + " trailing extra words", "s"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])

    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.0, df_cap=5).collect()
    }
    assert pairs == {(100, 101)}  # recall kept, boilerplate pairs gone


def test_ngram_jaccard_cap_never_binds_on_fixture(spark, sf_dir):
    # On fixture data (≤ 500 docs) the default cap can't bind, so the
    # capped operator must be byte-identical to the uncapped one — the
    # guarantee that makes the oracle-side cap a no-op at test scale.
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import load_table

    docs = load_table(spark, sf_dir, "documents")
    capped = sorted(map(tuple, ngram_jaccard_pairs(docs).collect()))
    uncapped = sorted(map(tuple, ngram_jaccard_pairs(docs, df_cap=None).collect()))
    assert capped == uncapped


def test_simhash_near_pairs(planted_docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(planted_docs, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0  # identical text → identical simhash
    assert (0, 2) in pairs  # near-dup within hamming 3
    assert (4, 5) not in pairs


def test_lsh_topk_finds_true_neighbors(spark):
    # 3 tight clusters; ANN through bucket probing must return same-cluster
    # neighbors for an easy margin.
    import math

    def vec(center: int, jitter: int) -> list[float]:
        return [
            math.sin(center * 37.0 + d) + 0.01 * jitter for d in range(16)
        ]

    rows = [
        (c * 10 + j, vec(c, j), c) for c in range(3) for j in range(8)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = lsh_topk(emb, query_ids=[0, 10, 20], k=3, dim=16).collect()
    assert len(got) > 0
    for r in got:
        assert r["query_id"] // 10 == r["neighbor_id"] // 10, (
            f"ANN crossed clusters: {r}"
        )
        assert r["cos"] > 0.99


def _topk_recall(approx_rows, truth: dict[int, set]) -> float:
    got: dict[int, set] = {}
    for r in approx_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    return hits / sum(len(t) for t in truth.values())


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """Recall regression bound for the IVF ANN path on fixture embeddings:
    nprobe=2 must recover ≥ 0.9 of the exact cosine top-k, and the nprobe
    dial must be monotone (probing more cells never loses neighbors)."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.similarity import (
        N_QUERIES,
        ivf_topk,
        similarity_topk,
    )
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import load_table

    truth: dict[int, set] = {}
    for r in similarity_topk(spark, sf_dir).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    emb = load_table(spark, sf_dir, "embeddings")
    qids = list(range(N_QUERIES))
    r1 = _topk_recall(ivf_topk(emb, qids, nprobe=1).collect(), truth)
    r2 = _topk_recall(ivf_topk(emb, qids, nprobe=2).collect(), truth)
    assert r2 >= 0.9, f"IVF nprobe=2 recall {r2:.2f} < 0.9"
    assert r2 >= r1, f"nprobe dial not monotone: {r1:.2f} → {r2:.2f}"


def test_pair_graph_transitivity_on_planted_shapes(spark):
    """Exact wedge census on known graphs: a 3-path is one open wedge
    (transitivity 0), a triangle is three closed wedges (1.0), and the
    two together mix to 3/4."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.dedup import (
        pair_graph_transitivity,
    )

    def run(edges):
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        return pair_graph_transitivity(df).collect()[0]

    path = run([(1, 2), (2, 3)])
    assert (path["n_edges"], path["n_wedges"], path["n_closed_wedges"]) == (2, 1, 0)
    assert path["transitivity"] == 0.0
    tri = run([(1, 2), (2, 3), (1, 3)])
    assert (tri["n_wedges"], tri["n_closed_wedges"]) == (3, 3)
    assert tri["transitivity"] == 1.0
    mixed = run([(1, 2), (2, 3), (1, 3), (3, 4)])
    # triangle's 3 closed wedges + open wedges through vertex 3 (2-3-4,
    # 1-3-4): 5 wedges, 3 closed
    assert (mixed["n_wedges"], mixed["n_closed_wedges"]) == (5, 3)
    assert mixed["transitivity"] == 0.6
    empty = run([])
    assert empty["n_wedges"] == 0 and empty["transitivity"] == 1.0


def test_encoding_health_flags_planted_damage(spark):
    """The encoding gate must flag exactly the damaged docs: U+FFFD rows,
    control-byte rows (tab/LF/CR exempt), and an ascii_ratio that drops
    only when non-ASCII text is present."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        encoding_health,
    )

    docs = spark.createDataFrame(
        [
            ("s1", "clean ascii text"),
            ("s1", "moji � here"),
            ("s1", "ctrl \x07 byte"),
            ("s1", "tabs\tand\nnewlines are fine"),
            ("s2", "café naïve"),  # valid non-ASCII, not damage
        ],
        ["source", "text"],
    )
    got = {r["source"]: r for r in encoding_health(docs).collect()}
    assert got["s1"]["mojibake_docs"] == 1
    assert got["s1"]["ctrl_docs"] == 1
    # s1 is 64 chars of which only the U+FFFD is non-ASCII
    assert got["s1"]["ascii_ratio"] == round(63 / 64, 4)
    assert got["s2"]["mojibake_docs"] == 0 and got["s2"]["ctrl_docs"] == 0
    assert got["s2"]["ascii_ratio"] < 1.0


def test_knn_label_accuracy_on_separable_clusters(spark, tmp_path):
    """Planted-structure check for the kNN label-accuracy harness: two
    tight, well-separated clusters labeled 0/1 must score accuracy 1.0
    per label; the per-label query counts must cover the eval sample.
    (Oracle parity pins cross-engine values; this pins the SEMANTICS —
    a harness that ignored the vote or the true label could still
    hash-match a broken oracle twin.)"""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.similarity import (
        KNN_EVAL_QUERIES,
        knn_label_accuracy,
    )

    rows = []
    for i in range(120):
        lab = i % 2
        base = [10.0, 0.0, 0.0] if lab == 0 else [0.0, 10.0, 0.0]
        jit = [(i % 7) * 0.01, (i % 5) * 0.01, (i % 3) * 0.01]
        rows.append((i, [b + j for b, j in zip(base, jit)], lab))
    path = str(tmp_path / "embeddings.parquet")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(path)
    got = {
        r["label"]: r
        for r in knn_label_accuracy(spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 1}
    assert all(r["accuracy"] == 1.0 for r in got.values())
    assert sum(r["n_queries"] for r in got.values()) == min(120, KNN_EVAL_QUERIES)


def test_lsh_topk_recall_on_planted_clusters(spark):
    """Recall bound for the hyperplane-LSH path in its applicable regime
    (clustered data — single-bucket probing on uniformly random vectors
    has no locality to exploit, which is why the fixture-wide bound lives
    on the IVF path above): ≥ 0.9 of the exact top-k, computed here
    against a numpy brute-force ground truth."""
    import math

    import numpy as np

    def vec(center: int, jitter: int) -> list[float]:
        return [math.sin(center * 37.0 + d) + 0.01 * jitter for d in range(16)]

    rows = [(c * 10 + j, vec(c, j), c) for c in range(3) for j in range(8)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    qids = [0, 10, 20]

    mat = {vid: np.array(v) for vid, v, _ in rows}
    truth: dict[int, set] = {}
    for q in qids:
        sims = sorted(
            (
                (float(mat[q] @ v) / (np.linalg.norm(mat[q]) * np.linalg.norm(v)), vid)
                for vid, v in mat.items()
                if vid != q
            ),
            key=lambda t: (-t[0], t[1]),
        )
        truth[q] = {vid for _, vid in sims[:3]}

    got = lsh_topk(emb, query_ids=qids, k=3, dim=16).collect()
    recall = _topk_recall(got, truth)
    assert recall >= 0.9, f"LSH recall {recall:.2f} < 0.9 on planted clusters"


def test_lsh_multiprobe_monotone_recall(spark, sf_dir):
    """Multi-probe LSH (Hamming-1 bucket expansion) must never lose
    recall vs exact-bucket probing, and must return a superset of the
    exact-bucket results for each query (a vector lives in exactly one
    bucket, so extra probes only ADD candidates)."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.similarity import (
        N_QUERIES,
        similarity_topk,
    )
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import load_table

    truth: dict[int, set] = {}
    for r in similarity_topk(spark, sf_dir).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    emb = load_table(spark, sf_dir, "embeddings")
    qids = list(range(N_QUERIES))
    exact = lsh_topk(emb, qids, dim=64).collect()
    multi = lsh_topk(emb, qids, dim=64, multiprobe=True).collect()
    assert _topk_recall(multi, truth) >= _topk_recall(exact, truth)

    def by_query(rows):
        out: dict[int, set] = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    e_by, m_by = by_query(exact), by_query(multi)
    for q, neigh in e_by.items():
        # top-k may reorder as candidates improve, but an exact-bucket
        # neighbor can only be displaced by a strictly better candidate
        assert len(m_by.get(q, set())) >= len(neigh)


def test_split_sample_is_partitioning_invariant(spark, sf_dir):
    """The split/sample assignments are pure functions of the row's
    content hash — the whole point of the design is that the result must
    not depend on cluster layout.  The same assignment expressions over
    arbitrarily repartitioned input must produce byte-identical
    per-(split, source) rollups."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        SAMPLE_RATE_PCT,
        sample_col,
        split_col,
        split_sample,
    )
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import load_table

    base = sorted(map(tuple, split_sample(spark, sf_dir).collect()))
    docs = load_table(spark, sf_dir, "documents")
    for n_parts in (1, 7):
        got = sorted(
            map(
                tuple,
                docs.repartition(n_parts)
                .select(
                    split_col(F.col("doc_id")).alias("split"),
                    "source",
                    "n_chars",
                    sample_col(F.col("doc_id"), SAMPLE_RATE_PCT)
                    .cast("int")
                    .alias("in_sample"),
                )
                .groupBy("split", "source")
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_chars").alias("total_chars"),
                    F.sum("in_sample").cast("long").alias("n_sampled"),
                    F.sum(F.col("in_sample") * F.col("n_chars"))
                    .cast("long")
                    .alias("sampled_chars"),
                )
                .collect(),
            )
        )
        assert got == base, f"split drifted under {n_parts} partitions"


def test_pretoken_count_segments_like_bpe_pretokenizer(spark):
    """The fixture corpus is all lowercase words, where whitespace and
    pretoken counts coincide — prove the pretokenizer actually segments:
    letter runs, digit runs, and punctuation runs each count separately."""
    from pyspark.sql import functions as F

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        PRETOKEN_RE,
    )

    df = spark.createDataFrame(
        [("don't pay $12.50 now",)], ["text"]
    ).select(F.expr(f"regexp_count(text, '{PRETOKEN_RE}')").alias("n"))
    # don | ' | t | pay | $ | 12 | . | 50 | now  → 9 pretokens, 4 words
    assert df.collect()[0]["n"] == 9


def test_split_fractions_near_nominal(spark):
    """The md5-prefix split must actually produce ~80/10/10: a silent
    hash bug (wrong substring, wrong base, truncated range) would skew
    the fractions long before any determinism test noticed."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        split_col,
    )
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import load_table

    # pool both doc fixtures for a larger sample
    counts = {"train": 0, "val": 0, "test": 0}
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = load_table(spark, sf, "documents")
        for r in (
            docs.select(split_col(F.col("doc_id")).alias("s"))
            .groupBy("s")
            .count()
            .collect()
        ):
            counts[r["s"]] += r["count"]
    total = sum(counts.values())
    assert abs(counts["train"] / total - 0.80) < 0.05
    assert abs(counts["val"] / total - 0.10) < 0.04
    assert abs(counts["test"] / total - 0.10) < 0.04


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", "s1"), (2, "", "s2")], ["doc_id", "text", "source"]
    )
    media = documents_as_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    feats = {r["item_id"]: r for r in extract_features(media).collect()}
    assert feats[1]["n_bytes"] == 11
    assert feats[1]["head_byte"] == ord("h")
    assert feats[2]["n_bytes"] == 0 and feats[2]["head_byte"] is None


def test_multimodal_stubs_are_explicit():
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        HAS_PIL,
    )

    if not HAS_PIL:  # this container: NON-PNG codec path is an explicit
        # stub (a truncated magic is not a decodable PNG); baseline PNG
        # decodes + resizes for real via the stdlib codec
        import numpy as np

        from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
            decode_png_pixels,
            encode_png,
        )

        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG")
        with pytest.raises(NotImplementedError):
            resize_image(b"\x89PNG", 32, 32)
        px = np.arange(64, dtype=np.uint8).reshape(8, 8)
        assert (decode_image(encode_png(px)).reshape(8, 8) == px).all()
        small = decode_png_pixels(resize_image(encode_png(px), 4, 4))
        assert small.shape == (4, 4, 1)
        assert (small.reshape(4, 4) == px[::2, ::2]).all()  # NN resample
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF")
    frames = frame_sample(b"0123456789abcdef", n_frames=4)
    assert len(frames) == 4 and frames[0] == b"0123"
    assert frame_sample(b"") == []
    assert resize_bytes(b"abcdef") == b"ace"
    assert resize_bytes(b"", 2) == b""


def _png(w, h):
    import struct

    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    )


def _gif(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h)


def _bmp(w, h):
    import struct

    # BITMAPINFOHEADER (dib size 40 at offset 14), top-down (negative h)
    return (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 40)
        + struct.pack("<ii", w, -h) + b"\x00" * 4
    )


def _jpeg(w, h):
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", h, w)
    return b"\xff\xd8" + app0 + sof0 + b"\x00" * 12


def _wav(n_ch, rate, bits, seconds):
    import struct

    data = b"\x00" * int(seconds * rate * n_ch * bits // 8)
    byte_rate = rate * n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, byte_rate, n_ch * bits // 8, bits)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_parse_image_dims_real_headers():
    """The dependency-free default decoder REALLY parses the four common
    container headers (handcrafted per-format binary payloads), and
    returns None for junk instead of raising."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        parse_image_dims,
    )

    assert parse_image_dims(_png(640, 480)) == (640, 480, "PNG")
    assert parse_image_dims(_gif(13, 37)) == (13, 37, "GIF")
    assert parse_image_dims(_bmp(800, 600)) == (800, 600, "BMP")  # top-down abs
    assert parse_image_dims(_jpeg(1920, 1080)) == (1920, 1080, "JPEG")
    assert parse_image_dims(b"not an image at all") is None
    assert parse_image_dims(b"") is None
    assert parse_image_dims(b"\xff\xd8\xff") is None  # truncated JPEG


def test_image_features_default_decoder_needs_no_codec(spark):
    """extract_image_features with NO decoder and NO PIL runs end-to-end
    on real container headers — metadata decode is genuinely functional
    in a library-free container, not a stub."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        HAS_PIL,
        extract_image_features,
    )

    if HAS_PIL:
        pytest.skip("PIL installed: this pins the dependency-free branch")
    media = spark.createDataFrame(
        [
            (1, "image/png", _png(320, 200), "s1"),
            (2, "image/jpeg", _jpeg(64, 32), "s1"),
            (3, "image/bin", b"junk bytes", "s2"),
        ],
        ["item_id", "media_type", "payload", "source"],
    )
    rows = {r["item_id"]: r for r in extract_image_features(media).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["mode"]) == (320, 200, "PNG")
    assert (rows[2]["width"], rows[2]["height"], rows[2]["mode"]) == (64, 32, "JPEG")
    assert rows[3]["width"] is None and rows[3]["mode"] is None


def test_image_features_wiring_with_injected_decoder(spark):
    """The decode → mapInPandas wiring runs end-to-end with an injected
    decoder (the closure ships with the task), so the Spark-side path is
    real in this container even though the PIL codec itself is optional."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        extract_image_features,
    )

    def fake_decode(payload: bytes):
        if not payload:
            return None  # undecodable → null features
        return (len(payload), len(payload) * 2, "FAKE")

    docs = spark.createDataFrame(
        [(1, "hello", "s1"), (2, "", "s2")], ["doc_id", "text", "source"]
    )
    rows = {
        r["item_id"]: r
        for r in extract_image_features(
            documents_as_media(docs), decoder=fake_decode
        ).collect()
    }
    assert (rows[1]["width"], rows[1]["height"], rows[1]["mode"]) == (5, 10, "FAKE")
    assert rows[2]["width"] is None and rows[2]["mode"] is None


def test_image_features_real_pil_decode(spark):
    """Real-codec branch: exercised only where PIL is installed."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        HAS_PIL,
        extract_image_features,
    )

    if not HAS_PIL:
        pytest.skip("PIL not installed in this container")
    from io import BytesIO

    from PIL import Image

    buf = BytesIO()
    Image.new("RGB", (7, 3)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image/png", buf.getvalue(), "s1")],
        ["item_id", "media_type", "payload", "source"],
    )
    row = extract_image_features(media).collect()[0]
    # same vocabulary as the dependency-free fallback: container FORMAT
    assert (row["width"], row["height"], row["mode"]) == (7, 3, "PNG")


def test_progressive_jpeg_decode_against_independent_encoder():
    """Golden cross-check against an INDEPENDENT progressive encoder
    (PIL/libjpeg), not just the in-repo encode_jpeg_progressive twin — a
    shared spec misunderstanding (AC-refinement ZRL, EOB-run handling)
    would round-trip the twins cleanly yet fail on real libjpeg streams.
    Skipped where PIL is absent (this container); the handcrafted-
    bitstream unit tests pin the same mechanisms dependency-free."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        HAS_PIL,
        decode_jpeg_pixels,
    )

    if not HAS_PIL:
        pytest.skip("PIL not installed in this container")
    from io import BytesIO

    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    for quality in (95, 75):
        buf = BytesIO()
        Image.fromarray(px).save(
            buf, format="JPEG", quality=quality, progressive=True
        )
        got = decode_jpeg_pixels(buf.getvalue())
        assert got is not None and got.shape == (24, 17, 3)
        want = np.asarray(Image.open(BytesIO(buf.getvalue())).convert("RGB"))
        # libjpeg's IDCT and ours may round intermediate values apart by
        # a hair; the decoded planes must agree within a tight tolerance
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 2, diff.max()


def test_progressive_jpeg_decode_against_libjpeg_golden():
    """Checked-in golden cross-check that runs in EVERY container (no PIL
    needed): three progressive streams produced by the system libjpeg via
    ``tests/golden/gen_jpeg_golden.c``, asserted against libjpeg's own
    decode of each stream.  Odd dims + 2x2 subsampling, unsubsampled
    low-quality, and grayscale cover the scan-script/EOB/refinement paths
    the round-9 advisory flagged as twin-only-verified."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
    )

    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "jpeg_progressive_golden",
        os.path.join(
            os.path.dirname(__file__), "golden", "jpeg_progressive_golden.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    GOLDENS = mod.GOLDENS

    for name, g in GOLDENS.items():
        h, w, c = g["shape"]
        # the stream really is progressive (SOF2 marker present)
        assert b"\xff\xc2" in g["jpeg"], name
        got = decode_jpeg_pixels(g["jpeg"])
        assert got is not None, name
        got = np.asarray(got).reshape(h, w, c)
        want = np.frombuffer(g["libjpeg_pixels"], dtype=np.uint8).reshape(
            h, w, c
        )
        diff = np.abs(got.astype(int) - want.astype(int))
        # libjpeg islow IDCT vs our float IDCT round apart by ≤2 LSB
        assert diff.max() <= 2, (name, diff.max())
        assert diff.mean() < 0.5, (name, diff.mean())


def test_multimodal_frame_explosion(spark):
    docs = spark.createDataFrame(
        [(1, "0123456789abcdef", "s1"), (2, "xy", "s2"), (3, "", "s3")],
        ["doc_id", "text", "source"],
    )
    rows = sample_frames(documents_as_media(docs)).collect()
    by_item: dict[int, list] = {}
    for r in rows:
        by_item.setdefault(r["item_id"], []).append(r)
    # 16 bytes → 4 frames of 4; thumbnails stride-2
    f1 = sorted(by_item[1], key=lambda r: r["frame_idx"])
    assert [bytes(r["frame_bytes"]) for r in f1] == [
        b"0123", b"4567", b"89ab", b"cdef",
    ]
    assert bytes(f1[0]["thumb_bytes"]) == b"02"
    # 2 bytes → step 1 → frames capped at 4 → 2 single-byte frames
    assert [bytes(r["frame_bytes"]) for r in sorted(by_item[2], key=lambda r: r["frame_idx"])] == [b"x", b"y"]
    # empty payload → no frame rows at all
    assert 3 not in by_item


# --------------------------------------------------------------------------
# Skew mitigation: salted join / two-phase agg must be result-identical to
# their unsalted forms, with the salt visible in the shuffle key.
def _skewed_frames(spark):
    # 90% of fact rows hit key 0 — the hot-key shape AQE splitting alone
    # can't always fix
    fact = spark.createDataFrame(
        [(i, 0 if i % 10 else i % 7, float(i)) for i in range(2000)],
        ["row_id", "k", "v"],
    )
    dim = spark.createDataFrame(
        [(k, f"name_{k}") for k in range(7)], ["k", "k_name"]
    )
    return fact, dim


def test_salted_join_matches_plain_join(spark):
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.skew import (
        salted_join,
    )

    fact, dim = _skewed_frames(spark)
    plain = fact.join(dim, ["k"]).select("row_id", "k", "v", "k_name")
    salted = salted_join(fact, dim, ["k"], n_salts=4).select(
        "row_id", "k", "v", "k_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_agg_matches_plain_agg(spark):
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.skew import (
        salted_agg,
    )

    fact, _ = _skewed_frames(spark)
    plain = {
        tuple(r)
        for r in fact.groupBy("k")
        .agg(
            F.sum("v").alias("sum_v"),
            F.count(F.lit(1)).alias("n"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }
    salted = {
        tuple(r)
        for r in salted_agg(
            fact,
            ["k"],
            {
                "sum_v": F.sum("v"),
                "n": F.count(F.lit(1)),
                "max_v": F.max("v"),
            },
            n_salts=4,
        ).collect()
    }
    assert plain == salted


def test_salted_join_shuffles_on_salt(spark):
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.skew import (
        salted_join,
    )

    fact, dim = _skewed_frames(spark)
    df = salted_join(fact, dim, ["k"], n_salts=4)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the salt column participates in the join condition → shuffle key
    assert "__salt" in plan


def test_approx_distinct_error_bound(spark):
    """HLL++ sketch stays within its configured relative error (2% rsd →
    assert a loose 3σ ≈ 6% band) of the exact distinct count."""
    from ida_ice_energy_simulation_etl_pipeline_spark.plans import ALL_QUERIES

    rows = ALL_QUERIES["approx_distinct_users"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_users - r.exact_users) <= max(1, 0.06 * r.exact_users)


def test_approx_percentile_error_bound(spark):
    """t-digest approx_percentile lands within 1% relative error of the
    exact interpolated quantile (the 100 TB path for grouped quantiles)."""
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import load_table

    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    row = orders.agg(
        F.expr("percentile(o_totalprice, 0.9)").alias("exact"),
        F.expr("approx_percentile(o_totalprice, 0.9, 1000)").alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= 0.01 * row.exact


def test_connected_components_semantics(spark):
    """Path graph (diameter 3), triangle, and isolated vertex all resolve
    to min-id components."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.graph import (
        connected_components,
    )

    vertices = spark.createDataFrame(
        [(i,) for i in range(8)], "vertex_id long"
    )
    #  path: 1-2-3-4   triangle: 5-6, 6-7, 5-7   isolated: 0
    edges = spark.createDataFrame(
        [(4, 3), (3, 2), (2, 1), (5, 6), (6, 7), (5, 7)], "src long, dst long"
    )
    got = {
        r.vertex_id: r.component
        for r in connected_components(vertices, edges).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 5}


def test_top_token_count_long_document(spark):
    """The most-frequent-token kernel is a sort + single-pass fold — linear
    in document length.  A 25k-token low-redundancy document (the case
    where the old per-distinct-token scan went O(|distinct|·n) ≈ 6×10⁸
    comparisons) must return the exact count with no timing cliff."""
    from ida_ice_energy_simulation_etl_pipeline_spark.functions import word_tokens
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        top_token_count,
    )

    # 24k unique tokens + 1k planted repeats of "the", shuffled
    # deterministically by interleaving.
    words = []
    for i in range(24_000):
        words.append(f"w{i}")
        if i % 24 == 0:
            words.append("the")
    text = " ".join(words)
    df = spark.createDataFrame([(text,), ("a b a", ), ("solo",)], "text string")
    expr = df.select(top_token_count(word_tokens(F.col("text"))).alias("c"))
    got = sorted(r[0] for r in expr.collect())
    assert got == [1, 2, 1000]
    # Linearity asserted STRUCTURALLY (a wall-clock bound flakes on a busy
    # box): the kernel must be ONE fold over ONE sorted array — the
    # quadratic form it replaced scanned per distinct token, which shows
    # up as array_distinct feeding a nested per-element transform.
    plan = expr._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("array_sort") == 1
    assert "array_distinct" not in plan


# --------------------------------------------------------------------------
# PII scrubbing — adversarial planted text (the registry query plants
# arithmetic-derived PII; these fixtures hit the regex edge cases).
def test_scrub_pii_counts_and_redacts(spark):
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        PII_RULES,
        scrub_pii,
    )

    rows = [
        # multiple matches of one type in one doc -> global replacement
        (0, "mail a@b.co then c.d+tag@e-corp.org and AGAIN a@b.co"),
        # all three types in one doc
        (1, "email x_1%y@z.io from 192.168.0.1 call 555-123-4567"),
        # near-misses that must NOT match: no TLD, 5-part quad stays
        # partially matched, 3-3-3 phone shape
        (2, "not-an-email a@b from 1.2.3.4.5 call 555-123-456"),
        (3, "clean document with no personal data at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}

    assert (got[0]["n_email"], got[0]["n_ip"], got[0]["n_phone"]) == (3, 0, 0)
    assert got[0]["scrubbed"].count("<EMAIL>") == 3
    assert "a@b.co" not in got[0]["scrubbed"]

    assert (got[1]["n_email"], got[1]["n_ip"], got[1]["n_phone"]) == (1, 1, 1)
    assert got[1]["scrubbed"] == "email <EMAIL> from <IP> call <PHONE>"

    # '1.2.3.4.5' contains a dotted quad prefix ('1.2.3.4') — the \b
    # boundary sits between '4' and '.', so the quad IS redacted and the
    # trailing '.5' survives; 'a@b' (no TLD) and '555-123-456' do not
    # match at all.
    assert got[2]["n_email"] == 0 and got[2]["n_phone"] == 0
    assert got[2]["n_ip"] == 1
    assert "<IP>.5" in got[2]["scrubbed"]
    assert "a@b " in got[2]["scrubbed"]

    assert got[3]["scrubbed"] == got[3]["text"]

    # nothing matching any rule survives in any scrubbed output
    for pat, _, suffix in PII_RULES:
        residual = (
            scrub_pii(df)
            .select(F.regexp_count("scrubbed", F.lit(pat)).alias("n"))
            .agg(F.sum("n"))
            .collect()[0][0]
        )
        assert residual == 0, f"unredacted {suffix} remains"


def test_scrub_pii_is_map_only(spark):
    """The scrub is a single projection — no exchange, no UDF, no join."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import scrub_pii

    df = spark.createDataFrame([(1, "x@y.io")], ["doc_id", "text"])
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "BatchEvalPython", "ArrowEvalPython", "Join"):
        assert bad not in plan


def test_mix_copies_weights_and_determinism(spark):
    """floor(w) copies always; the fractional extra copy is a pure
    content-hash function (never rand), so two evaluations agree and the
    realized rate sits near frac(w)."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        MIX_WEIGHT_CYCLE,
        MIX_WEIGHT_STEP,
        mix_copies_col,
    )

    rows = [(i, f"src{s}") for s in range(MIX_WEIGHT_CYCLE) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = df.select(
        "source", mix_copies_col(F.col("source"), F.col("doc_id")).alias("c")
    )
    got = {
        r["source"]: (r["lo"], r["hi"], r["avg"])
        for r in out.groupBy("source")
        .agg(F.min("c").alias("lo"), F.max("c").alias("hi"), F.avg("c").alias("avg"))
        .collect()
    }
    for s in range(MIX_WEIGHT_CYCLE):
        w = (s % MIX_WEIGHT_CYCLE + 1) * MIX_WEIGHT_STEP
        lo, hi, avg = got[f"src{s}"]
        assert lo == int(w // 1) and hi == int(w // 1) + (1 if w % 1 else 0)
        assert abs(avg - w) < 0.08, f"src{s}: realized {avg} vs weight {w}"
    # deterministic: a second evaluation over a different partitioning
    # yields the identical per-doc copy counts
    again = (
        df.repartition(7)
        .select("doc_id", "source", mix_copies_col(F.col("source"), F.col("doc_id")).alias("c"))
        .collect()
    )
    first = {
        (r["doc_id"], r["source"]): r["c"]
        for r in df.select(
            "doc_id", "source", mix_copies_col(F.col("source"), F.col("doc_id")).alias("c")
        ).collect()
    }
    assert all(first[(r["doc_id"], r["source"])] == r["c"] for r in again)


# --------------------------------------------------------------------------
# Large-star/small-star connected components — the O(log n)-round variant
def _uf_ground_truth(n, edge_list):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component = min id reachable
    comp = {}
    for v in range(n):
        r = find(v)
        comp.setdefault(r, v)
    return {v: min(comp[find(v)], find(v)) for v in range(n)}


def test_cc_star_matches_label_prop_and_ground_truth(spark):
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    #  path 1-2-3-4, triangle 5-6-7, isolated 0, plus dup/self edges
    n = 8
    edge_list = [(4, 3), (3, 2), (2, 1), (5, 6), (6, 7), (5, 7), (3, 2), (6, 6)]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "vertex_id long")
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    truth = _uf_ground_truth(n, edge_list)
    star_labels, rounds = connected_components_star(vertices, edges)
    got_star = {r.vertex_id: r.component for r in star_labels.collect()}
    got_prop = {
        r.vertex_id: r.component
        for r in connected_components(vertices, edges).collect()
    }
    assert got_star == truth == got_prop
    assert rounds <= 6


def test_cc_star_beats_label_prop_rounds_on_a_chain(spark):
    """A 64-node path has diameter 63: min-label propagation needs ~63
    rounds (it would blow the 50-round safety rail), while the
    star algorithm collapses it in O(log n) rounds."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    n = 64
    vertices = spark.createDataFrame([(i,) for i in range(n)], "vertex_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    labels, rounds = connected_components_star(vertices, edges)
    got = {r.vertex_id: r.component for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 12, f"expected O(log n) rounds, took {rounds}"


def test_cc_star_random_graph_matches_ground_truth(spark):
    import random

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    rng = random.Random(7)
    n = 200
    edge_list = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(120)
    ]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "vertex_id long")
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    truth = _uf_ground_truth(n, edge_list)
    labels, _ = connected_components_star(vertices, edges)
    got = {r.vertex_id: r.component for r in labels.collect()}
    assert got == truth


def test_kmeans_refine_recovers_planted_clusters(spark):
    """Three well-separated planted clusters: after refinement every
    member is assigned with its cluster-mates, and refinement strictly
    improves on the seed assignment (seeds 0,1,2 all come from planted
    cluster A, so the seed codebook CANNOT separate B and C — the
    centroid-update step has to discover them)."""
    import random

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.similarity import (
        kmeans_refine,
    )

    rng = random.Random(3)
    dim = 8
    centers = {
        "A": [5.0, 0, 0, 0, 0, 0, 0, 0],
        "B": [0, 5.0, 0, 0, 0, 0, 0, 0],
        "C": [0, 0, 5.0, 0, 0, 0, 0, 0],
    }
    rows, truth = [], {}
    vid = 0
    for name in ("A", "A", "A", "B", "B", "C"):  # seeds 0-2 all in A
        for _ in range(10):
            vec = [c + rng.gauss(0, 0.3) for c in centers[name]]
            rows.append((vid, vec))
            truth[vid] = name
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_refine(emb, k=3, iterations=4)
    got = {r["vec_id"]: r["cluster_id"] for r in out.collect()}
    # purity: every final cluster maps to exactly one planted cluster
    by_cluster = {}
    for v, c in got.items():
        by_cluster.setdefault(c, set()).add(truth[v])
    assert all(len(names) == 1 for names in by_cluster.values()), by_cluster
    assert len(by_cluster) == 3  # all three planted clusters separated


def test_ivf_with_refined_codebook(spark, sf_dir):
    """kmeans_centroids slots into ivf_topk as a trained codebook: recall
    holds >= 0.9 at nprobe=2, and the refined quantizer balances cells
    better than the raw seed codebook (smaller max/mean cell ratio =
    tighter worst-case probe cost, the property that matters at scale)."""
    from pyspark.sql import functions as F

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.similarity import (
        N_QUERIES,
        ivf_topk,
        kmeans_centroids,
        kmeans_refine,
        similarity_topk,
    )
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import load_table

    truth: dict[int, set] = {}
    for r in similarity_topk(spark, sf_dir).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    emb = load_table(spark, sf_dir, "embeddings")
    cb = kmeans_centroids(emb)
    # nprobe=3 at the 200-vector fixture: trained cells are tighter than
    # the seed Voronoi, so true neighbors sit across more cell borders on
    # a corpus this tiny — more probes is the standard dial (at sf0.1 the
    # refined codebook reaches recall 1.0 at nprobe=1).
    got = ivf_topk(emb, list(range(N_QUERIES)), nprobe=3, codebook=cb).collect()
    assert _topk_recall(got, truth) >= 0.9

    def max_over_mean(sizes):
        return max(sizes) / (sum(sizes) / len(sizes))

    refined = [
        r["n"]
        for r in kmeans_refine(emb).groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    ]
    seed = [
        r["n"]
        for r in kmeans_refine(emb, iterations=1).groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    ]
    assert max_over_mean(refined) <= max_over_mean(seed) + 1e-9


def test_scrub_pii_overlapping_pii_counts_equal_redactions(spark):
    """An email whose domain contains a dotted quad: the email rule wins
    the overlap, and the counts reflect redactions actually performed —
    no double-counting (the quad is gone before the IP rule runs)."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import scrub_pii

    rows = [
        (0, "mail u@1.2.3.4.com now"),
        (1, "phone-in-local 555-123-4567@corp.io end"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert (got[0]["n_email"], got[0]["n_ip"], got[0]["n_phone"]) == (1, 0, 0)
    assert got[0]["scrubbed"] == "mail <EMAIL> now"
    assert (got[1]["n_email"], got[1]["n_ip"], got[1]["n_phone"]) == (1, 0, 0)
    assert got[1]["scrubbed"] == "phone-in-local <EMAIL> end"
    for r in got.values():
        assert r["n_email"] + r["n_ip"] + r["n_phone"] == r["text"].count("@")


# --------------------------------------------------------------------------
# Batched embedding inference (iterator mapInPandas stand-in model)
def test_embed_documents_deterministic_and_composes(spark, planted_docs):
    """Embeddings are a pure function of text (invariant under
    partitioning AND Arrow batch boundaries), unit-normalized, and feed
    the semantic-dedup operator directly: the planted exact/near dups
    surface as the top cosine pairs."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.dedup import (
        embedding_near_pairs,
    )
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.inference import (
        EMBED_DIM,
        embed_documents,
    )

    def run(df):
        return {
            r["doc_id"]: r["embedding"]
            for r in embed_documents(df).select("doc_id", "embedding").collect()
        }

    base = run(planted_docs)
    # force many tiny Arrow batches through ONE task + a different
    # partitioning: identical output proves batch/partition invariance
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
        rebatched = run(planted_docs.repartition(3))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert base == rebatched

    for v in base.values():
        assert len(v) == EMBED_DIM
        assert abs(sum(x * x for x in v) - 1.0) < 1e-5  # unit L2

    emb = embed_documents(planted_docs).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    pairs = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in embedding_near_pairs(emb, dim=EMBED_DIM, threshold=0.8).collect()
    }
    assert pairs.get((0, 1)) == 1.0  # exact dup -> identical embedding
    assert (0, 2) in pairs  # near dup -> high cosine
    assert (4, 5) not in pairs  # unrelated docs stay apart


def test_semantic_dedup_keeps_farthest_from_centroid(spark):
    """SemDeDup planted geometry: a near-dup pair inside one cell keeps
    exactly the member with the LOWER cosine-to-centroid (the paper's
    boundary-example preference); isolated vectors survive untouched."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.dedup import (
        semantic_dedup_frame,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # centroid 0 (first-k seed codebook)
        (1, [0.0, 1.0, 0.0, 0.0]),   # centroid 1
        (2, [0.6, 0.8, 0.0, 0.0]),   # cell 1: cos-to-c1 = 0.8
        (3, [0.59, 0.81, 0.0, 0.0]), # near-dup of 2, cos-to-c1 ~ 0.808
        (4, [0.0, 0.9, 0.5, 0.0]),   # cell 1, far from 2/3 at tau=0.95
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r
        for r in semantic_dedup_frame(emb, n_centroids=2, tau=0.95).collect()
    }
    assert len(got) == 5
    # pair (2, 3): cos(2,3) > 0.95; vec 2 has the lower cent_cos -> kept
    assert got[2]["centroid_id"] == 1 and got[3]["centroid_id"] == 1
    assert got[2]["cent_cos"] < got[3]["cent_cos"]
    assert got[2]["kept"] == 1
    assert got[3]["kept"] == 0
    # the centroids themselves and the isolated member survive
    assert got[0]["kept"] == 1 and got[1]["kept"] == 1 and got[4]["kept"] == 1


def test_semantic_dedup_accepts_trained_codebook(spark):
    """kmeans_centroids output slots into semantic_dedup_frame via the
    same codebook contract as ivf_topk; the near-dup pair still resolves
    to one survivor under the trained quantizer."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.dedup import (
        semantic_dedup_frame,
    )
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.similarity import (
        kmeans_centroids,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.6, 0.8, 0.0, 0.0]),
        (3, [0.59, 0.81, 0.0, 0.0]),
        (4, [0.0, 0.9, 0.5, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = kmeans_centroids(emb, k=2, iterations=2)
    got = {
        r["vec_id"]: r
        for r in semantic_dedup_frame(emb, tau=0.95, codebook=cb).collect()
    }
    assert len(got) == 5
    assert got[2]["centroid_id"] == got[3]["centroid_id"]  # twins share a cell
    assert got[2]["kept"] + got[3]["kept"] == 1  # exactly one survives


def test_semantic_dedup_cell_size_guard_fires(spark):
    """An oversized cell fails FAST with the actionable codebook message
    (the SCALE.md skew caveat's runtime teeth), and the same degenerate
    input succeeds with the guard disabled — proving the guard, not the
    data, raised."""
    import pytest

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.dedup import (
        semantic_dedup_frame,
    )

    # n_centroids=1 funnels every vector into one cell — the degenerate
    # codebook the guard exists for.
    rows = [(i, [1.0, float(i), 0.0, 0.0]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="max_cell_rows=4"):
        semantic_dedup_frame(
            emb, n_centroids=1, tau=0.99, max_cell_rows=4
        ).collect()
    got = semantic_dedup_frame(
        emb, n_centroids=1, tau=0.99, max_cell_rows=None
    ).collect()
    assert len(got) == 6


def test_parse_audio_meta_real_wav_header():
    """Handcrafted 16-bit stereo 8 kHz WAV: the RIFF chunk walk recovers
    channels/rate/bits and computes duration from the data-chunk size."""
    import struct

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        parse_audio_meta,
    )

    assert parse_audio_meta(_wav(2, 8000, 16, 0.5)) == (2, 8000, 16, 0.5, False)
    # inflated size field (truncated/corrupt body): duration still reports
    # the header's intent, but the truncated flag exposes the mismatch so
    # duration-based curation filters can't be fooled by a forged header
    full = _wav(2, 8000, 16, 0.5)
    cut = full[: len(full) - 100]
    assert parse_audio_meta(cut) == (2, 8000, 16, 0.5, True)
    assert parse_audio_meta(b"ID3\x04 not a wav") is None
    assert parse_audio_meta(b"RIFF\x00\x00\x00\x00AVI ") is None  # not WAVE
    assert parse_audio_meta(b"") is None


def test_extract_audio_features_end_to_end(spark):
    """WAV metadata extraction runs through mapInPandas with no codec:
    real WAV rows get channels/rate/duration, junk rows get nulls."""
    import struct

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        extract_audio_features,
    )

    media = spark.createDataFrame(
        [
            (1, "audio/wav", _wav(1, 16000, 16, 2.0), "s1"),
            (2, "audio/mp3", b"ID3\x04junk", "s1"),
        ],
        ["item_id", "media_type", "payload", "source"],
    )
    rows = {r["item_id"]: r for r in extract_audio_features(media).collect()}
    assert (rows[1]["n_channels"], rows[1]["sample_rate"]) == (1, 16000)
    assert rows[1]["duration_s"] == 2.0 and rows[1]["truncated"] is False
    assert rows[2]["n_channels"] is None and rows[2]["duration_s"] is None
    assert rows[2]["truncated"] is None


def _avi(
    width: int, height: int, n_frames: int, us_per_frame: int
) -> bytes:
    """Minimal spec-shaped AVI: RIFF 'AVI ' → LIST 'hdrl' → avih(56) +
    a LIST 'movi' stub — enough structure that the parser must actually
    recurse into the nested LIST to find the main header."""
    import struct

    avih_body = struct.pack(
        "<14I",
        us_per_frame,
        1_000_000,  # max bytes/sec
        0,  # padding granularity
        0x10,  # flags (HASINDEX)
        n_frames,
        0,  # initial frames
        1,  # streams
        65536,  # suggested buffer
        width,
        height,
        0,
        0,
        0,
        0,  # reserved
    )
    avih = b"avih" + struct.pack("<I", len(avih_body)) + avih_body
    hdrl_body = b"hdrl" + avih
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi"
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def test_parse_video_meta_real_avi_header():
    """Handcrafted 640x480 25fps AVI: the recursive RIFF walk finds the
    avih header inside the nested hdrl LIST; non-AVI and truncated
    payloads degrade to None instead of raising."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        parse_video_meta,
    )

    got = parse_video_meta(_avi(640, 480, 250, 40_000))
    assert got == (640, 480, 250, 25.0, 10.0)
    assert parse_video_meta(b"RIFF\x00\x00\x00\x00WAVE") is None  # a WAV
    # bare ftyp with no moov: recognized as MP4 but carries no metadata
    assert parse_video_meta(b"\x00\x00\x00\x18ftypmp42") is None
    assert parse_video_meta(b"") is None
    # truncated mid-header: the avih body is clipped below 40 bytes
    whole = _avi(640, 480, 250, 40_000)
    assert parse_video_meta(whole[:40]) is None
    # zero us_per_frame must not divide by zero
    assert parse_video_meta(_avi(10, 10, 5, 0))[3] == 0.0


def _box(btype: bytes, body: bytes, largesize: bool = False) -> bytes:
    """One ISO-BMFF box; largesize=True uses the size==1 64-bit header."""
    import struct

    if largesize:
        return struct.pack(">I", 1) + btype + struct.pack(">Q", 16 + len(body)) + body
    return struct.pack(">I", 8 + len(body)) + btype + body


def _mp4(
    width: int,
    height: int,
    n_frames: int,
    timescale: int,
    duration_ticks: int,
    *,
    v1: bool = False,
    handler: bytes = b"vide",
    large_moov: bool = False,
) -> bytes:
    """Minimal spec-shaped MP4: ftyp + moov(mvhd + trak(tkhd +
    mdia(hdlr + minf(stbl(stsz))))) — enough nesting that the parser
    must walk the real container tree and associate the hdlr/tkhd/stsz
    of ONE trak.  v1 switches mvhd/tkhd to the 64-bit-time layouts."""
    import struct

    if v1:
        mvhd = b"\x01\x00\x00\x00" + b"\x00" * 16 + struct.pack(
            ">IQ", timescale, duration_ticks
        )
        tkhd = (
            b"\x01\x00\x00\x00"
            + b"\x00" * 32  # ctime8 mtime8 trackid4 reserved4 duration8
            + b"\x00" * 16  # reserved8 + layer/alt/vol/pad
            + b"\x00" * 36  # matrix
            + struct.pack(">II", width << 16, height << 16)
        )
    else:
        mvhd = b"\x00" * 12 + struct.pack(">II", timescale, duration_ticks)
        tkhd = (
            b"\x00" * 4
            + b"\x00" * 20  # ctime mtime trackid reserved duration
            + b"\x00" * 16  # reserved8 + layer/alt/vol/pad
            + b"\x00" * 36  # matrix
            + struct.pack(">II", width << 16, height << 16)
        )
    hdlr = b"\x00" * 8 + handler + b"\x00" * 12
    stsz = b"\x00" * 8 + struct.pack(">I", n_frames)
    stbl = _box("stbl".encode(), _box(b"stsz", stsz))
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", _box(b"hdlr", hdlr) + minf)
    trak = _box(b"trak", _box(b"tkhd", tkhd) + mdia)
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak, largesize=large_moov)
    return _box(b"ftyp", b"mp42\x00\x00\x00\x00mp42isom") + moov


def test_parse_video_meta_real_mp4_header():
    """Handcrafted 1280x720 MP4 (v0 and v1 box layouts, plus a 64-bit
    largesize moov): the ISO-BMFF box walk recovers resolution from
    tkhd's 16.16 fixed point, frame count from stsz, and duration from
    mvhd; audio-only tracks and corrupt size fields degrade to None."""
    import struct

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        parse_video_meta,
    )

    # 300 frames over 12 s (timescale 1000) = 25 fps
    assert parse_video_meta(_mp4(1280, 720, 300, 1000, 12_000)) == (
        1280, 720, 300, 25.0, 12.0,
    )
    assert parse_video_meta(_mp4(640, 360, 48, 600, 1200, v1=True)) == (
        640, 360, 48, 24.0, 2.0,
    )
    assert parse_video_meta(
        _mp4(320, 240, 10, 1000, 5000, large_moov=True)
    ) == (320, 240, 10, 2.0, 5.0)
    # audio-only MP4: no vide track → None
    assert parse_video_meta(_mp4(0, 0, 99, 1000, 5000, handler=b"soun")) is None
    # zero movie duration: fps pins to 0.0 instead of dividing by zero
    assert parse_video_meta(_mp4(320, 240, 10, 1000, 0))[3] == 0.0
    # truncated mid-moov: short bodies, no exception
    whole = _mp4(1280, 720, 300, 1000, 12_000)
    for cut in (10, 40, len(whole) // 2, len(whole) - 3):
        got = parse_video_meta(whole[:cut])
        assert got is None or got[0] >= 0
    # truncated v1 mvhd (body 20-31 bytes): must be skipped, not read
    # with v0 offsets — v0 offsets would land on mid-ctime bytes and
    # report garbage duration.  Build a moov whose mvhd box is a v1
    # header clipped to 24 body bytes around an otherwise-valid trak.
    ok = _mp4(1280, 720, 300, 1000, 12_000, v1=True)
    clipped_mvhd = _box(b"mvhd", (b"\x01\x00\x00\x00" + b"\x00" * 20))
    trak_start = ok.index(b"trak") - 4
    moov_end = ok.index(b"moov") + 4 + (
        int.from_bytes(ok[ok.index(b"moov") - 4 : ok.index(b"moov")], "big") - 8
    )
    trak = ok[trak_start:moov_end]
    bad = _box(b"ftyp", b"mp42\x00\x00\x00\x00mp42isom") + _box(
        b"moov", clipped_mvhd + trak
    )
    assert parse_video_meta(bad) is None
    # adversarial size fields: size<8 (loop guard) and size=0 (to-EOF)
    junk = _box(b"ftyp", b"mp42") + struct.pack(">I", 3) + b"moov"
    assert parse_video_meta(junk) is None
    eof_box = _box(b"ftyp", b"mp42") + struct.pack(">I", 0) + b"free"
    assert parse_video_meta(eof_box) is None


def test_parse_video_meta_deeply_nested_lists_no_recursion():
    """Adversarial payload: thousands of nested LIST chunks inside a
    valid RIFF AVI header — the iterative walk returns None (or a
    found header) instead of RecursionError killing a Spark task."""
    import struct

    inner = b""
    for _ in range(5000):
        body = b"xxxx" + inner  # 4-byte list type + previous level
        inner = b"LIST" + struct.pack("<I", len(body)) + body
    bomb = b"RIFF" + struct.pack("<I", len(inner) + 4) + b"AVI " + inner
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        parse_video_meta,
    )

    assert parse_video_meta(bomb) is None
    # the same nesting with an avih at the bottom still parses
    avih_payload = _avi(320, 240, 10, 100_000)
    hdr = avih_payload[12:]  # hdrl LIST + movi LIST
    nested = hdr
    for _ in range(2000):
        body = b"xxxx" + nested
        nested = b"LIST" + struct.pack("<I", len(body)) + body
    deep = b"RIFF" + struct.pack("<I", len(nested) + 4) + b"AVI " + nested
    assert parse_video_meta(deep) == (320, 240, 10, 10.0, 1.0)


def test_extract_video_features_end_to_end(spark):
    """AVI + MP4 metadata extraction runs through mapInPandas with no
    codec: real container rows get resolution/fps/duration, junk rows
    (headerless MP4 fragments included) get nulls."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        extract_video_features,
    )

    media = spark.createDataFrame(
        [
            (1, "video/avi", _avi(1920, 1080, 300, 33_333), "s1"),
            (2, "video/mp4", b"\x00\x00\x00\x18ftypmp42junk", "s1"),
            (3, "video/avi", None, "s2"),
            (4, "video/mp4", _mp4(1280, 720, 240, 1000, 8000), "s2"),
        ],
        "item_id long, media_type string, payload binary, source string",
    )
    rows = {r["item_id"]: r for r in extract_video_features(media).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["n_frames"]) == (
        1920,
        1080,
        300,
    )
    assert abs(rows[1]["fps"] - 30.00030) < 1e-3
    assert rows[2]["width"] is None and rows[3]["duration_s"] is None
    assert (rows[4]["width"], rows[4]["height"], rows[4]["n_frames"]) == (
        1280,
        720,
        240,
    )
    assert rows[4]["fps"] == 30.0 and rows[4]["duration_s"] == 8.0


def test_parse_image_dims_edge_variants():
    """Round-4 review regressions: JPEG fill bytes before markers, OS/2
    core-header BMPs, and compressed-WAV duration via the byte-rate
    field."""
    import struct

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        parse_audio_meta,
        parse_image_dims,
    )

    # JPEG with 0xFF fill bytes before the SOF marker (B.1.1.2)
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 9, 5)
    filled = b"\xff\xd8" + b"\xff\xff\xff" + sof0 + b"\x00" * 12
    assert parse_image_dims(filled) == (5, 9, "JPEG")

    # OS/2 BITMAPCOREHEADER: dib size 12, uint16 dims at 18/20
    core = (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 12)
        + struct.pack("<HHHH", 100, 100, 1, 24)
    )
    assert parse_image_dims(core) == (100, 100, "BMP")

    # ADPCM-style WAV: bits=4, real byte_rate in the header — duration
    # must come from byte_rate, not n_ch*rate*bits/8
    byte_rate = 4550
    fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, byte_rate, 256, 4)
    data = b"\x00" * (byte_rate * 2)  # 2 s of compressed audio
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    assert parse_audio_meta(wav) == (1, 8000, 4, 2.0, False)


def test_embed_documents_null_for_token_free_text(spark):
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.inference import (
        embed_documents,
    )

    df = spark.createDataFrame(
        [(1, "real words here"), (2, ""), (3, "   ")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["embedding"]
        for r in embed_documents(df).select("doc_id", "embedding").collect()
    }
    assert got[1] is not None and abs(sum(x * x for x in got[1]) - 1.0) < 1e-5
    assert got[2] is None and got[3] is None  # never a zero vector


# --------------------------------------------------------------------------
# Passage-level (C4-style block) dedup.


def test_passage_dedup_keeps_first_occurrence_only(spark):
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.dedup import (
        passage_dedup,
    )

    boiler = " ".join(f"b{i}" for i in range(8))  # one exact 8-token block
    uniq_a = " ".join(f"a{i}" for i in range(8))
    uniq_c = " ".join(f"c{i}" for i in range(8))
    rows = [
        (0, boiler + " " + uniq_a),  # first corpus occurrence of boiler
        (1, boiler + " " + uniq_c),  # later occurrence -> boiler dropped
        (2, boiler),                 # fully duplicated -> empty survivor
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in passage_dedup(docs, block=8).collect()}
    assert len(out) == 3  # every doc present, even the fully-dropped one
    assert out[0]["n_kept"] == 2 and out[0]["text_dedup"] == rows[0][1]
    assert out[1]["n_kept"] == 1 and out[1]["text_dedup"] == uniq_c
    assert out[2]["n_kept"] == 0 and out[2]["text_dedup"] == ""
    assert out[2]["n_blocks"] == 1


def test_passage_dedup_preserves_intra_doc_block_order(spark):
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.dedup import (
        passage_dedup,
    )

    # 3 distinct blocks; a duplicate of the MIDDLE one planted in a later
    # doc must not disturb the first doc's re-assembly order
    blocks = [" ".join(f"w{j}_{i}" for i in range(4)) for j in range(3)]
    rows = [(0, " ".join(blocks)), (1, blocks[1])]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in passage_dedup(docs, block=4).collect()}
    assert out[0]["text_dedup"] == " ".join(blocks)
    assert out[1]["n_kept"] == 0


def test_passage_dedup_rehydrate_variant_identical(spark):
    """The hash-ride + join-back escape hatch must produce byte-identical
    results to the default text-carrying plan — on the crafted corner
    cases above AND the sf0.001 fixture (5k-block scale exercises real
    shuffle partitioning on both paths)."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.dedup import (
        passage_dedup,
    )
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import (
        load_table,
    )

    boiler = " ".join(f"b{i}" for i in range(8))
    rows = [
        (0, boiler + " " + " ".join(f"a{i}" for i in range(8))),
        (1, boiler),
        (2, ""),
    ]
    crafted = spark.createDataFrame(rows, ["doc_id", "text"])
    fixture = load_table(spark, "/root/testdata/sf0.001", "documents")
    for docs, block in [(crafted, 8), (fixture, None)]:
        kwargs = {} if block is None else {"block": block}
        a = sorted(map(tuple, passage_dedup(docs, **kwargs).collect()))
        b = sorted(
            map(tuple, passage_dedup(docs, rehydrate=True, **kwargs).collect())
        )
        assert a == b


def test_lm_perplexity_ranks_gibberish_above_fluent(spark, tmp_path):
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        lm_perplexity,
    )

    fluent = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, fluent, "en", "src0", len(fluent)) for i in range(9)]
    gibberish = "zq xv jk wp qn rl tb md cf gh"
    rows.append((9, gibberish, "xx", "src1", len(gibberish)))
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in lm_perplexity(spark, str(tmp_path)).collect()}
    # every bigram in the gibberish doc is corpus-unique -> far higher ppl
    fluent_ppl = max(out[i]["ppl"] for i in range(9))
    assert out[9]["ppl"] > 2 * fluent_ppl


def test_pq_topk_recovers_planted_clusters(spark):
    """PQ asymmetric-distance ANN on tight clusters: quantized candidates
    must still rank same-cluster neighbors first, and cluster members
    must collapse to identical PQ codes (the 16x compression claim)."""
    import math

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.similarity import (
        pq_encode,
        pq_topk,
    )

    def vec(center: int, jitter: int) -> list[float]:
        return [math.sin(center * 37.0 + d) + 0.001 * jitter for d in range(16)]

    # vec_id<8 double as the deterministic codebook — interleave ids
    # (cluster = id % 3) so the first 8 ids span all 3 centers and every
    # cluster gets codebook entries to quantize to
    rows = [(j * 3 + c, vec(c, j), c) for c in range(3) for j in range(8)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = pq_topk(emb, query_ids=[0, 2], k=3, dim=16, m=4, n_codes=8).collect()
    assert len(got) == 6
    for r in got:
        assert r["query_id"] % 3 == r["neighbor_id"] % 3, (
            f"PQ ANN crossed clusters: {r}"
        )
    codes = {
        r["vec_id"]: tuple(r[f"code_{i}"] for i in range(4))
        for r in pq_encode(emb, dim=16, m=4, k=8).collect()
    }
    # every member quantizes to SAME-cluster codebook entries in every
    # subspace (the codebook holds ~3 entries per cluster, so members may
    # split across them, but never across clusters)
    for c in range(3):
        for j in range(8):
            for code in codes[j * 3 + c]:
                assert code % 3 == c, f"vec {j * 3 + c} quantized cross-cluster"


def test_passage_dedup_unique_corpus_is_identity(spark):
    """When no block repeats corpus-wide, passage dedup must be a perfect
    round-trip: every doc keeps all blocks and re-assembles to its exact
    original text (whitespace-tokenized corpora only — the operator's
    documented contract)."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.dedup import (
        passage_dedup,
    )

    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(n)))
        for i, n in enumerate([1, 7, 8, 9, 16, 17, 31])
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in passage_dedup(docs, block=8).collect()}
    for i, text in rows:
        assert out[i]["text_dedup"] == text, f"doc {i} not a round-trip"
        assert out[i]["n_kept"] == out[i]["n_blocks"]
        assert out[i]["n_blocks"] == -(-len(text.split()) // 8)


def test_doc_chunks_cover_with_overlap(spark, tmp_path):
    """Chunk windows must tile the doc completely with the configured
    stride overlap: every token appears in >= 1 chunk, consecutive chunks
    share exactly CHUNK_TOKENS - CHUNK_STRIDE tokens, and a short doc is
    one whole-text chunk."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        doc_chunks,
    )

    long_n = CHUNK_TOKENS + 2 * CHUNK_STRIDE + 5  # 3 strides worth
    rows = [
        (0, " ".join(f"t{j}" for j in range(long_n)), "en", "src0", 0),
        (1, "short doc", "en", "src0", 0),
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = doc_chunks(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    chunks0 = sorted(by_doc[0], key=lambda r: r["chunk_idx"])
    toks = [c["chunk_text"].split() for c in chunks0]
    # full coverage, in order
    covered = toks[0] + [t for w in toks[1:] for t in w[CHUNK_TOKENS - CHUNK_STRIDE:]]
    assert covered == [f"t{j}" for j in range(long_n)]
    # exact overlap between consecutive windows
    for a, b in zip(toks, toks[1:]):
        assert a[CHUNK_STRIDE:] == b[: CHUNK_TOKENS - CHUNK_STRIDE]
    assert [c["chunk_text"] for c in by_doc[1]] == ["short doc"]
    assert by_doc[1][0]["chunk_tokens"] == 2


def test_table_profile_empty_table_keeps_one_row_per_column(spark, tmp_path):
    """Contract: one stats row per declared column even on an EMPTY
    table (n=0, ndv=0, null min/max) — the grouped formulation would
    otherwise silently drop columns."""
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import load_table
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.relational import (
        PROFILE_COLUMNS,
        table_profile,
    )

    src = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    src.filter("l_orderkey < 0").repartition(1).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    rows = {r["column_name"]: r for r in table_profile(spark, str(tmp_path)).collect()}
    assert set(rows) == set(PROFILE_COLUMNS)
    for r in rows.values():
        assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (0, 0, 0)
        assert r["min_value"] is None and r["max_value"] is None


def test_dup_pairs_by_source_classifies_within_vs_cross(spark, tmp_path):
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.dedup import (
        dup_pairs_by_source,
    )

    rows = [
        (0, "same text here", "srcA"),
        (1, "same text here", "srcA"),   # within-source dup
        (2, "same text here", "srcB"),   # cross-source dups with 0 and 1
        (3, "unique content one", "srcB"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows, ["doc_id", "text", "source"]).write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    got = {
        (r["source_a"], r["source_b"], r["same_source"]): r["n_dup_pairs"]
        for r in dup_pairs_by_source(spark, d).collect()
    }
    assert got == {
        ("srcA", "srcA", True): 1,   # (0,1)
        ("srcA", "srcB", False): 2,  # (0,2), (1,2)
    }


def test_dup_span_stats_catches_unaligned_duplicates(spark, tmp_path):
    """A passage repeated at a DIFFERENT token offset is invisible to
    fixed-block passage dedup but must show up in the stride-1 span scan."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.dedup import (
        dup_span_stats,
        passage_dedup,
    )

    boiler = " ".join(f"b{i}" for i in range(8))
    pre = "x y z"  # 3-token shift: misaligns every 8-token block
    rows = [
        (0, boiler + " " + " ".join(f"u{i}" for i in range(8)), "srcA"),
        (1, pre + " " + boiler + " " + " ".join(f"v{i}" for i in range(5)), "srcB"),
    ]
    d = str(tmp_path)
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    # block dedup misses it: every doc keeps all blocks
    blocks = {r["doc_id"]: r for r in passage_dedup(docs, block=8).collect()}
    assert all(r["n_kept"] == r["n_blocks"] for r in blocks.values())
    # span scan flags the shared boiler span in BOTH sources
    stats = {r["source"]: r for r in dup_span_stats(spark, d).collect()}
    assert stats["srcA"]["n_dup_spans"] >= 1
    assert stats["srcB"]["n_dup_spans"] >= 1


def test_span_scrub_excises_unaligned_repeat_keeps_unique(spark):
    """The removal half: an 8-token passage repeated at a different
    offset is cut from BOTH occurrences; tokens outside any duplicated
    window survive in order; sub-span docs pass through untouched."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.dedup import (
        span_scrub_frame,
    )

    boiler = " ".join(f"b{i}" for i in range(8))
    uniq_a = " ".join(f"u{i}" for i in range(8))
    uniq_b = " ".join(f"v{i}" for i in range(8))
    rows = [
        (0, boiler + " " + uniq_a, "srcA"),
        (1, "x y z " + boiler + " " + uniq_b, "srcB"),
        (2, "too short", "srcC"),  # < span tokens: no windows, untouched
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r["doc_id"]: r for r in span_scrub_frame(docs).collect()}
    # doc 0: boiler excised exactly (windows straddling the boundary are
    # unique, so only positions 0..7 are covered); unique tail survives
    assert got[0]["n_scrubbed"] == 8
    assert got[0]["text_scrubbed"] == uniq_a
    # doc 1: same 8 boiler tokens cut at offset 3; prefix + tail survive
    assert got[1]["n_scrubbed"] == 8
    assert got[1]["text_scrubbed"] == "x y z " + uniq_b
    # doc 2: shorter than the span width — identity
    assert got[2]["n_scrubbed"] == 0
    assert got[2]["text_scrubbed"] == "too short"


def test_span_scrub_long_repeat_excised_wholesale(spark):
    """A repeated passage LONGER than the window width marks overlapping
    stride-1 windows whose union covers the whole passage."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.dedup import (
        span_scrub_frame,
    )

    passage = " ".join(f"p{i}" for i in range(20))  # 20-token repeat
    rows = [
        (0, passage + " " + " ".join(f"a{i}" for i in range(8)), "s"),
        (1, " ".join(f"c{i}" for i in range(4)) + " " + passage, "s"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r["doc_id"]: r for r in span_scrub_frame(docs).collect()}
    assert got[0]["n_scrubbed"] == 20
    assert got[0]["text_scrubbed"] == " ".join(f"a{i}" for i in range(8))
    assert got[1]["n_scrubbed"] == 20
    assert got[1]["text_scrubbed"] == " ".join(f"c{i}" for i in range(4))


# --------------------------------------------------------------------------
# Rolling z-score anomaly detection (plans/analytics.py::rolling_anomaly)
def test_rolling_anomaly_flags_planted_spike(spark, tmp_path):
    from datetime import datetime, timedelta

    from ida_ice_energy_simulation_etl_pipeline_spark.plans.analytics import (
        rolling_anomaly,
    )

    t0 = datetime(2024, 1, 1)
    # 60 calm readings around 10.0 (tiny deterministic wiggle), one 100.0
    # spike at the end, then one more calm reading scored against a
    # baseline that now CONTAINS the spike (variance inflated → not
    # flagged) — the -N..-1 frame keeps the spike itself flaggable.
    rows = []
    for i in range(60):
        rows.append((i, t0 + timedelta(minutes=i), 1, "A", 10.0 + (i % 5) * 0.1, None))
    rows.append((60, t0 + timedelta(minutes=60), 1, "A", 100.0, None))
    rows.append((61, t0 + timedelta(minutes=61), 1, "A", 10.2, None))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = {r.event_type: r for r in rolling_anomaly(spark, str(tmp_path)).collect()}
    a = out["A"]
    # row 0 has an empty (-50..-1) baseline and row 1 a single-row one
    # (stddev_samp of 1 value is null) → both unscored
    assert a.n_scored == 60
    assert a.n_outliers == 1
    assert a.max_abs_z > 100  # the spike is hundreds of σ out on calm data


def test_incremental_dedup_flags_batch_against_index(spark, tmp_path):
    """doc_id % 10 splits the fixture: 0-7 indexed, 8-9 incoming batch.
    An exact copy must flag exact_dup, a near-dup must surface index band
    collisions without an exact hit, and novel text must come out is_new."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.dedup import (
        incremental_dedup,
    )

    text_a = "the quick brown fox jumps over the lazy dog near the river bank today"
    text_b = (
        "energy simulation pipelines aggregate hourly meter readings into monthly "
        "rollups and the warehouse layer exposes curated views joining zone "
        "conditions weather traces and equipment schedules for downstream analysts"
    )
    rows = [(i, f"filler index doc number {i} " + " ".join(f"w{i}x{j}" for j in range(12)), "s")
            for i in range(2, 8)]
    rows += [(0, text_a, "s"), (1, text_b, "s")]
    rows += [
        (8, text_a, "s"),                                   # exact copy of idx 0
        (9, text_b.replace("hourly", "daily"), "s"),        # near-dup of idx 1
        (18, "completely novel content about nothing seen before in any corpus", "s"),
    ]
    spark.createDataFrame(rows, ["doc_id", "text", "source"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in incremental_dedup(spark, str(tmp_path)).collect()}
    assert set(out) == {8, 9, 18}
    assert out[8]["exact_dup"] == 1 and out[8]["is_new"] == 0
    assert out[9]["exact_dup"] == 0
    assert out[9]["n_near_index"] >= 1 and out[9]["is_new"] == 0
    assert out[18]["exact_dup"] == 0 and out[18]["n_near_index"] == 0
    assert out[18]["is_new"] == 1


def test_column_histograms_matches_numpy_linear_quantiles(spark, tmp_path):
    """The rank-bracket interpolation must reproduce linear-interpolation
    quantiles (numpy method='linear' == SQL quantile_cont) on planted
    edge cases: all-ties, distinct ramp, negatives+ties, two-valued."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.plans.relational import (
        HISTOGRAM_BUCKETS,
        PROFILE_COLUMNS,
        column_histograms,
    )

    n = 16
    planted = {
        "l_quantity": [5.0] * n,
        "l_extendedprice": [float(i + 1) for i in range(n)],
        "l_discount": [-3.5, -1.0, 2.0, 2.0, 7.25, 7.25, 7.25, 9.0] * 2,
        "l_tax": [0.0, 0.08] * 8,
    }
    rows = [tuple(planted[c][i] for c in PROFILE_COLUMNS) for i in range(n)]
    spark.createDataFrame(rows, PROFILE_COLUMNS).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = {
        (r["column_name"], r["bound_idx"]): r["boundary"]
        for r in column_histograms(spark, str(tmp_path)).collect()
    }
    fracs = [i / HISTOGRAM_BUCKETS for i in range(HISTOGRAM_BUCKETS + 1)]
    for c in PROFILE_COLUMNS:
        expect = np.quantile(np.array(planted[c]), fracs, method="linear")
        for i, e in enumerate(expect):
            assert out[(c, i)] == round(float(e), 4), (c, i, out[(c, i)], e)


def test_assignment_nan_cosine_ranks_first(spark):
    """A zero-norm centroid yields NaN cosine; the in-row argmax must
    treat NaN as the GREATEST similarity (DuckDB ORDER BY cos DESC and
    Spark max_by both sort NaN greatest) — a bare negation would flip it
    to worst and silently diverge assignments from the oracles."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.similarity import (
        _assign,
    )

    emb = spark.createDataFrame(
        [(10, [1.0, 2.0]), (11, [3.0, -1.0])], ["vec_id", "embedding"]
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], ["cluster_id", "c_emb"]
    )
    got = {r["vec_id"]: r["cluster_id"] for r in _assign(emb, cents).collect()}
    assert got == {10: 0, 11: 0}, got


def test_weighted_sample_partitioning_invariant_and_weighted(
    spark, sf_dir, tmp_path
):
    """A-ES keys are pure content-hash functions, so the sample must be
    byte-identical on any input layout; and with w = n_chars the sampled
    docs must skew LONGER than the corpus average (the weighting works)."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        weighted_sample,
    )
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import load_table

    base = sorted(map(tuple, weighted_sample(spark, sf_dir).collect()))
    assert len(base) > 0
    docs = load_table(spark, sf_dir, "documents")
    for n_parts in (1, 7):
        alt = tmp_path / f"p{n_parts}"
        docs.repartition(n_parts).write.parquet(
            str(alt / "documents.parquet")
        )
        got = sorted(map(tuple, weighted_sample(spark, str(alt)).collect()))
        assert got == base, f"layout {n_parts} changed the sample"
    sampled_avg = sum(r[3] for r in base) / len(base)
    corpus_avg = docs.agg(F.avg("n_chars")).collect()[0][0]
    assert sampled_avg > corpus_avg


# --------------------------------------------------------------------------
# Pure-stdlib GIF pixel codec (operators/multimodal.py) — the test-side
# LZW ENCODER here is an independent implementation, so encoder and
# decoder can't share a bug.
def _gif_lzw_encode(indices: bytes, min_code: int) -> bytes:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    seq = b""
    for b in indices:
        nxt = seq + bytes([b])
        if nxt in table:
            seq = nxt
            continue
        emit(table[seq])
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            # decoder widens when ITS next slot reaches 2^width; the
            # encoder mirrors that one step later (its table is one
            # entry ahead at emit time)
            width += 1
        seq = bytes([b])
    emit(table[seq])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_file(
    indices, palette, w: int, h: int, *, interlace: bool = False,
    min_code: int = 2,
) -> bytes:
    import struct

    gct_bits = 1
    while (1 << (gct_bits + 1)) < len(palette):
        gct_bits += 1
    n = 1 << (gct_bits + 1)
    pal = bytes(
        palette[i][c] if i < len(palette) else 0
        for i in range(n)
        for c in range(3)
    )
    lzw = _gif_lzw_encode(bytes(indices), min_code)
    blocks = b""
    for i in range(0, len(lzw), 255):
        part = lzw[i : i + 255]
        blocks += bytes([len(part)]) + part
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | gct_bits, 0, 0)
        + pal
        + b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE extension (skipped)
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        + bytes([min_code])
        + blocks
        + b"\x00\x3b"
    )


def test_gif_decoder_matches_independent_encoder():
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_gif_pixels,
        decode_image_pixels,
    )

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    rng = np.random.default_rng(11)
    idx = rng.integers(0, 4, size=(6, 5), dtype=np.uint8)
    blob = _gif_file(idx.ravel().tolist(), palette, 5, 6)
    got = decode_gif_pixels(blob)
    assert got is not None and got.shape == (6, 5, 3)
    expect = np.array(palette, dtype=np.uint8)[idx]
    assert (got == expect).all()
    # the dispatcher routes GIF too, and junk stays None
    assert (decode_image_pixels(blob) == expect).all()
    assert decode_gif_pixels(b"GIF89a\x00") is None
    assert decode_gif_pixels(blob[:20]) is None


def test_gif_decoder_interlaced_and_long_streams():
    """Interlaced row reordering, and an indices stream long enough to
    force LZW code-width growth past the initial width."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_gif_pixels,
    )

    palette = [(i, i, i) for i in range(8)]
    rng = np.random.default_rng(13)
    idx = rng.integers(0, 8, size=(16, 13), dtype=np.uint8)
    expect = np.array(palette, dtype=np.uint8)[idx]
    h = 16
    pass_order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    for interlace in (False, True):
        rows = idx[pass_order] if interlace else idx  # stream row order
        blob = _gif_file(
            rows.ravel().tolist(), palette, 13, 16,
            interlace=interlace, min_code=3,
        )
        got = decode_gif_pixels(blob)
        assert got is not None and (got == expect).all(), interlace


# Pure-stdlib PNG pixel codec (operators/multimodal.py)
def test_png_codec_round_trip_all_channel_counts():
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
        parse_image_dims,
    )

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(5, 7, ch), dtype=np.uint8)
        blob = encode_png(px)
        assert parse_image_dims(blob) == (7, 5, "PNG")  # header agrees
        back = decode_png_pixels(blob)
        assert back is not None and back.shape == (5, 7, ch)
        assert (back == px).all()


def test_png_decoder_unfilters_sub_up_average_paeth():
    """Hand-build IDAT scanlines using every PNG filter type and check
    the unfiltering against a known 3x3 grayscale image."""
    import struct
    import zlib

    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        _PNG_MAGIC,
        decode_png_pixels,
    )

    target = np.array(
        [[10, 20, 30], [15, 25, 35], [100, 90, 80]], dtype=np.uint8
    )
    # row 0: Sub (delta vs left), row 1: Up (delta vs above), row 2: Paeth
    r0 = bytes([1, 10, 10, 10])
    r1 = bytes([2, 5, 5, 5])

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    row2, prev = [4], [15, 25, 35]
    cur = []
    for x, v in enumerate([100, 90, 80]):
        a = cur[x - 1] if x >= 1 else 0
        b = prev[x]
        c = prev[x - 1] if x >= 1 else 0
        row2.append((v - paeth(a, b, c)) & 0xFF)
        cur.append(v)
    raw = r0 + r1 + bytes(row2)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    blob = (
        _PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got = decode_png_pixels(blob)
    assert got is not None and (got.reshape(3, 3) == target).all()


def test_png_decoder_rejects_unsupported_profiles():
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    assert decode_png_pixels(b"") is None
    assert decode_png_pixels(b"\xff\xd8not a png") is None
    blob = bytearray(encode_png(np.zeros((2, 2), dtype=np.uint8)))
    blob[24] = 3  # bit depth 3 is illegal for every color type
    assert decode_png_pixels(bytes(blob)) is None
    # depth 16 is a SUPPORTED profile since r9, but this payload's IDAT
    # is 8-bit-sized — the stream-length check must reject it, not crash
    blob[24] = 16
    assert decode_png_pixels(bytes(blob)) is None
    assert decode_png_pixels(bytes(encode_png(np.zeros((2, 2), np.uint8)))[:30]) is None


def test_image_pixel_stats_decodes_real_pngs_in_spark(spark):
    """The pixel-stats operator does REAL decode inside mapInPandas:
    planted constant-color PNGs come back with exact means; a non-PNG
    payload yields null stats."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        encode_png,
        image_pixel_stats,
    )

    flat42 = encode_png(np.full((4, 6, 3), 42, dtype=np.uint8))
    half = np.zeros((2, 2), dtype=np.uint8)
    half[0] = 200  # mean 100, std 100
    rows = [
        (1, "image/png", bytearray(flat42), "s"),
        (2, "image/png", bytearray(encode_png(half)), "s"),
        (3, "text/plain", bytearray(b"not an image"), "s"),
    ]
    media = spark.createDataFrame(
        rows, "item_id long, media_type string, payload binary, source string"
    )
    got = {r["item_id"]: r for r in image_pixel_stats(media).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (6, 4, 3)
    assert got[1]["mean_px"] == 42.0 and got[1]["std_px"] == 0.0
    assert got[2]["mean_px"] == 100.0 and got[2]["std_px"] == 100.0
    assert got[3]["width"] is None and got[3]["mean_px"] is None


def test_jpeg_huffman_and_dct_match_spec_vectors():
    """The canonical-code constructor and the DCT basis are the two
    pieces the encoder and decoder SHARE, so a mistake there would
    round-trip cleanly and only fail on external files — pin them to
    independently-known spec facts instead."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        _JPEG_DC_LUM,
        _JPEG_ZIGZAG,
        _huff_decode_table,
        _huff_encode_table,
        _jpeg_dct_basis,
    )

    # Annex-K DC-luminance canonical codes (JPEG spec, Table K.3):
    # category 0 → '00', 1..5 → 3-bit '010'..'110', 6 → '1110',
    # 7 → '11110', ..., 11 → '111111110'
    enc = _huff_encode_table(*_JPEG_DC_LUM)
    assert enc[0] == (0b00, 2)
    assert enc[1] == (0b010, 3) and enc[5] == (0b110, 3)
    assert enc[6] == (0b1110, 4)
    assert enc[11] == (0b111111110, 9)
    dec = _huff_decode_table(_JPEG_DC_LUM[0], bytes(_JPEG_DC_LUM[1]))
    assert all(dec[(n, c)] == s for s, (c, n) in enc.items())
    # zigzag: spec-defined walk starts 0,1,8,16,9,2 and ends ...,55,62,63
    assert _JPEG_ZIGZAG[:6] == [0, 1, 8, 16, 9, 2]
    assert _JPEG_ZIGZAG[-3:] == [55, 62, 63]
    assert sorted(_JPEG_ZIGZAG) == list(range(64))
    # DCT basis: orthonormal, and a flat block has ONLY a DC coefficient
    a = _jpeg_dct_basis()
    assert np.allclose(a @ a.T, np.eye(8), atol=1e-12)
    coef = a @ np.full((8, 8), 1.0) @ a.T
    assert np.isclose(coef[0, 0], 8.0) and np.allclose(coef.reshape(-1)[1:], 0.0)


def test_jpeg_roundtrip_gray_and_rgb():
    """encode_jpeg → decode_jpeg_pixels across quality, subsampling and
    restart-interval variants: dimensions exact, pixel error bounded by
    the quantization (flat images reconstruct exactly)."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    flat = np.full((16, 24), 130, dtype=np.uint8)
    got = decode_jpeg_pixels(encode_jpeg(flat, quality=90))
    assert got.shape == (16, 24, 1)
    assert int(np.abs(got[:, :, 0].astype(int) - 130).max()) == 0

    h, w = 24, 33  # non-multiple-of-8/16 edges exercise the padding
    y, x = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [(x * 7) % 256, (y * 11) % 256, ((x + y) * 5) % 256], axis=2
    ).astype(np.uint8)
    for q, sub, ri, tol in [
        (95, False, 0, 1.5),
        (75, True, 0, 6.0),
        (90, False, 2, 2.0),
        (85, True, 3, 6.0),
    ]:
        dec = decode_jpeg_pixels(
            encode_jpeg(rgb, quality=q, subsample=sub, restart_interval=ri)
        )
        assert dec is not None and dec.shape == (h, w, 3)
        assert float(np.abs(dec.astype(int) - rgb.astype(int)).mean()) < tol


def test_jpeg_decoder_gates_and_truncation():
    """Non-baseline profiles return None instead of garbage; every
    truncation point degrades to None, never an exception."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = encode_jpeg(px, quality=90)
    assert decode_jpeg_pixels(blob) is not None
    # progressive gate: flip SOF0 (FFC0) to SOF2 (FFC2)
    prog = blob.replace(b"\xff\xc0", b"\xff\xc2")
    assert decode_jpeg_pixels(prog) is None
    # arithmetic gate (SOF9)
    assert decode_jpeg_pixels(blob.replace(b"\xff\xc0", b"\xff\xc9")) is None
    # 12-bit precision gate: SOF precision byte is right after the length
    i = blob.index(b"\xff\xc0")
    twelve = blob[: i + 4] + bytes([12]) + blob[i + 5 :]
    assert decode_jpeg_pixels(twelve) is None
    # junk and truncation sweep
    assert decode_jpeg_pixels(b"") is None
    assert decode_jpeg_pixels(b"\xff\xd8") is None
    assert decode_jpeg_pixels(b"GIF89a_not_jpeg") is None
    for cut in range(2, len(blob), 7):
        got = decode_jpeg_pixels(blob[:cut])
        assert got is None or got.shape == (8, 8, 1)


def test_image_pixel_stats_decodes_real_jpegs_in_spark(spark):
    """The pixel-stats lane decodes planted JPEGs for real inside
    mapInPandas, alongside PNGs — flat payloads come back with exact
    means (quantization preserves a constant block exactly)."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        encode_jpeg,
        image_pixel_stats,
    )

    flat = encode_jpeg(np.full((8, 16, 3), 200, dtype=np.uint8), quality=90)
    gray = encode_jpeg(np.full((5, 7), 64, dtype=np.uint8), quality=90)
    rows = [
        (1, "image/jpeg", bytearray(flat), "s"),
        (2, "image/jpeg", bytearray(gray), "s"),
        (3, "image/jpeg", bytearray(flat[:40]), "s"),  # truncated → nulls
    ]
    media = spark.createDataFrame(
        rows, "item_id long, media_type string, payload binary, source string"
    )
    got = {r["item_id"]: r for r in image_pixel_stats(media).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (16, 8, 3)
    assert got[1]["mean_px"] == 200.0 and got[1]["std_px"] == 0.0
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (7, 5, 1)
    assert got[2]["mean_px"] == 64.0
    assert got[3]["width"] is None and got[3]["mean_px"] is None


def _pcm16_wav(n_ch, rate, frames):
    """WAV with REAL 16-bit PCM sample content: frames is a list of
    per-frame tuples of floats in [-1, 1]."""
    import struct

    data = b"".join(
        struct.pack("<h", max(-32768, min(32767, int(round(v * 32767)))))
        for fr in frames
        for v in fr
    )
    byte_rate = rate * n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, byte_rate, n_ch * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_decode_wav_samples_real_pcm_content():
    """The pure-stdlib PCM decoder recovers the actual sample values
    (16-bit signed round-trip to ~1/32767), keeps channel structure,
    handles 8-bit unsigned offset binary and IEEE float32, and returns
    None for compressed formats instead of fabricating samples."""
    import struct

    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_wav_samples,
    )

    frames = [(0.5, -0.5), (0.0, 1.0), (-1.0, 0.25)]
    arr = decode_wav_samples(_pcm16_wav(2, 8000, frames))
    assert arr.shape == (3, 2)
    assert np.allclose(arr, np.array(frames), atol=1.5 / 32767)

    # 8-bit unsigned: 128 is zero, 255 ~ +1, 0 = -1
    data8 = bytes([128, 255, 0])
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav8 = (
        b"RIFF" + struct.pack("<I", 36 + len(data8)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt8)) + fmt8
        + b"data" + struct.pack("<I", len(data8)) + data8
    )
    arr8 = decode_wav_samples(wav8)
    assert arr8.shape == (3, 1)
    assert abs(arr8[0, 0]) < 1e-9 and arr8[2, 0] == -1.0

    # IEEE float32 (format code 3) decodes bit-exactly
    f32 = struct.pack("<3f", 0.25, -0.75, 1.0)
    fmtf = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    wavf = (
        b"RIFF" + struct.pack("<I", 36 + len(f32)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmtf)) + fmtf
        + b"data" + struct.pack("<I", len(f32)) + f32
    )
    assert np.allclose(
        decode_wav_samples(wavf).ravel(), [0.25, -0.75, 1.0]
    )

    # ADPCM (format code 0x11) is NOT decodable without a codec
    fmt_adpcm = struct.pack("<HHIIHH", 0x11, 1, 8000, 4550, 256, 4)
    wav_adpcm = (
        b"RIFF" + struct.pack("<I", 36 + 4) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_adpcm)) + fmt_adpcm
        + b"data" + struct.pack("<I", 4) + b"\x00\x01\x02\x03"
    )
    assert decode_wav_samples(wav_adpcm) is None
    assert decode_wav_samples(b"not audio") is None


def test_decode_wav_samples_truncated_data_chunk_drops_partial_sample():
    """A truncated payload whose data chunk is not a multiple of the
    sample width decodes the whole samples and drops the partial tail —
    it must not raise (a single malformed row would otherwise fail the
    whole Spark stage instead of degrading as documented)."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_wav_samples,
    )

    frames = [(0.5,), (-0.5,), (0.25,)]
    wav = _pcm16_wav(1, 8000, frames)
    # Chop one byte off the 16-bit data chunk: 5 whole samples' worth of
    # bytes becomes 2 whole + 1 partial.  (Header size field now
    # overstates the chunk, as a genuinely truncated file's would.)
    truncated = wav[:-1]
    arr = decode_wav_samples(truncated)
    assert arr.shape == (2, 1)
    assert np.allclose(arr.ravel(), [0.5, -0.5], atol=1.5 / 32767)


def test_audio_sample_stats_tolerates_truncated_wav(spark):
    """extract_audio_sample_stats degrades malformed payloads to usable
    rows (truncated tail dropped) instead of failing the stage."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        extract_audio_sample_stats,
    )

    wav = _pcm16_wav(1, 8000, [(0.5,), (-0.5,), (0.25,)])
    rows = [
        (1, "audio/wav", bytearray(wav[:-1]), "s"),  # truncated 16-bit
        (2, "text/plain", bytearray(b"junk"), "s"),
    ]
    media = spark.createDataFrame(
        rows, "item_id long, media_type string, payload binary, source string"
    )
    got = {r["item_id"]: r for r in extract_audio_sample_stats(media).collect()}
    assert got[1]["n_frames"] == 2 and got[1]["peak"] is not None
    assert got[2]["n_frames"] is None and got[2]["rms"] is None


def test_decode_audio_returns_samples_for_pcm_and_gates_others():
    import pytest

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_audio,
    )

    arr = decode_audio(_pcm16_wav(1, 8000, [(0.5,), (-0.5,)]))
    assert arr.shape == (2, 1)
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04 not a wav")


def test_extract_audio_sample_stats_end_to_end(spark):
    """Sample-level stats (rms / peak / zero-crossing) computed from
    REAL decoded PCM through the Arrow mapInPandas path; undecodable
    rows yield nulls instead of poisoning the batch."""
    import math

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        extract_audio_sample_stats,
    )

    # mono square wave +0.5/-0.5: rms 0.5, peak 0.5, every step crosses
    frames = [(0.5,), (-0.5,), (0.5,), (-0.5,)]
    media = spark.createDataFrame(
        [
            (1, "audio/wav", bytearray(_pcm16_wav(1, 8000, frames)), "s"),
            (2, "audio/mp3", bytearray(b"ID3\x04junk"), "s"),
        ],
        "item_id long, media_type string, payload binary, source string",
    )
    got = {r["item_id"]: r for r in extract_audio_sample_stats(media).collect()}
    assert got[1]["n_frames"] == 4 and got[1]["n_channels"] == 1
    assert math.isclose(got[1]["rms"], 0.5, rel_tol=1e-3)
    assert math.isclose(got[1]["peak"], 0.5, rel_tol=1e-3)
    assert got[1]["zero_cross_rate"] == 1.0
    assert got[2]["n_frames"] is None and got[2]["rms"] is None


def test_table_profile_approx_within_hll_tolerance(spark):
    """The sketch-ndv profile variant agrees with the exact profile on
    every exact column and lands approx_ndv within the HLL rsd bound
    (rsd=0.02 -> assert 10 sigma = 20%) on every profiled column."""
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.relational import (
        table_profile,
        table_profile_approx,
    )

    sf = "/root/testdata/sf0.01"
    exact = {r["column_name"]: r for r in table_profile(spark, sf).collect()}
    approx = {
        r["column_name"]: r for r in table_profile_approx(spark, sf).collect()
    }
    assert set(exact) == set(approx)
    for c, e in exact.items():
        a = approx[c]
        assert (a["n_rows"], a["n_nulls"]) == (e["n_rows"], e["n_nulls"])
        assert a["min_value"] == e["min_value"]
        assert a["max_value"] == e["max_value"]
        assert abs(a["approx_ndv"] - e["n_distinct"]) <= max(
            0.2 * e["n_distinct"], 2
        )


def test_boilerplate_scrub_per_source_gate(spark):
    """The footer shared by 3 of source A's 4 docs is scrubbed from
    exactly those docs; the SAME window in source B (1 of 2 docs) stays —
    the gate is per-source document frequency, not global occurrence."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.dedup import (
        boilerplate_scrub_frame,
    )

    rows = [
        (1, "alpha beta gamma join our newsletter now", "sA"),
        (2, "delta epsilon join our newsletter now", "sA"),
        (3, "zeta eta theta iota join our newsletter now", "sA"),
        (4, "kappa lambda mu nu xi", "sA"),
        (40, "omicron pi rho join our newsletter now", "sB"),
        (41, "sigma tau upsilon phi", "sB"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        r["doc_id"]: r
        for r in boilerplate_scrub_frame(
            docs, span=4, min_docs=3, min_frac_pct=50
        ).collect()
    }
    assert len(out) == 6
    assert out[1]["text_clean"] == "alpha beta gamma"
    assert out[2]["text_clean"] == "delta epsilon"
    assert out[3]["text_clean"] == "zeta eta theta iota"
    assert all(out[d]["n_scrubbed"] == 4 for d in (1, 2, 3))
    # below the df gate (doc 4 in A) and below min_docs (source B): intact
    for d in (4, 40, 41):
        assert out[d]["n_scrubbed"] == 0
        assert out[d]["text_clean"] == rows[[1, 2, 3, 4, 40, 41].index(d)][1]


def test_dsir_weights_content_based_selection(spark):
    """Target-style docs score positive, out-of-distribution docs score
    negative, and the weight is a pure function of CONTENT: a raw-pool
    doc with target-identical text gets the target doc's exact weight."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        dsir_weights_frame,
    )

    gibberish = [
        "qq ww ee rr tt yy",
        "uu ii oo pp aa ss",
        "dd ff gg hh jj kk",
        "ll zz xx cc vv bb",
        "nn mm q1 w2 e3 r4",
        "t5 y6 u7 i8 o9 p0",
    ]
    rows = (
        [(i, "the cat sat on the mat", "en") for i in (1, 2, 3)]
        + [(4, "the cat sat on the mat", "de")]
        + [(10 + j, g, "de") for j, g in enumerate(gibberish)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r["doc_id"]: r for r in dsir_weights_frame(docs).collect()}
    assert len(out) == 10
    for d in (1, 2, 3):
        assert out[d]["is_target"] and out[d]["selected"]
        assert out[d]["log_weight"] > 0
    # content-identical raw doc: same weight, selected, not target
    assert not out[4]["is_target"]
    assert out[4]["log_weight"] == out[1]["log_weight"]
    assert out[4]["selected"]
    for d in range(10, 16):
        assert out[d]["log_weight"] < 0 and not out[d]["selected"]
    assert out[1]["n_bigrams"] == 5


def test_epoch_shuffle_contiguous_permutation(spark):
    """Positions are a contiguous 0..n-1 permutation equal to the global
    (shuffle_key, doc_id) sort order, shards derive from position, and
    the whole assignment is invariant under input partitioning."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        epoch_shuffle_frame,
    )

    docs = spark.createDataFrame(
        [(i, "t") for i in range(101)], ["doc_id", "text"]
    )
    out = epoch_shuffle_frame(docs, n_shards=4).collect()
    assert sorted(r["position"] for r in out) == list(range(101))
    by_key = sorted(out, key=lambda r: (r["shuffle_key"], r["doc_id"]))
    assert [r["position"] for r in by_key] == list(range(101))
    assert all(r["shard"] == r["position"] % 4 for r in out)
    out2 = epoch_shuffle_frame(docs.repartition(7), n_shards=4).collect()
    assert {(r["doc_id"], r["position"]) for r in out2} == {
        (r["doc_id"], r["position"]) for r in out
    }


def test_bpe_encode_multilevel_merge_table(spark):
    """A merge whose operand is an earlier merge's OUTPUT must fold
    correctly: (t,h) then (th,e) turns 'the' into ONE token — the
    property that distinguishes BPE application from single-pass pair
    replacement."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        bpe_encode_tokens,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(0, "the then lathe"), (1, "he thee")], ["doc_id", "text"]
    )
    merges = F.array(
        F.struct(F.lit("t").alias("a"), F.lit("h").alias("b")),
        F.struct(F.lit("th").alias("a"), F.lit("e").alias("b")),
    )
    out = {
        r["doc_id"]: r["toks"]
        for r in docs.select(
            "doc_id", bpe_encode_tokens(F.col("text"), merges).alias("toks")
        ).collect()
    }
    assert out[0] == ["the", "the", "n", "l", "a", "the"]
    # 'he' has no 't' — (t,h) never fires, (th,e) operand absent
    assert out[1] == ["h", "e", "the", "e"]


def test_bpe_encode_greedy_left_to_right_overlap(spark):
    """'aaaa' with merge (a,a) → [aa, aa]; 'aaa' → [aa, a] — the
    non-overlapping left-to-right scan, not regex lookahead or
    rescan-after-merge."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        bpe_encode_tokens,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(0, "aaaa aaa")], ["doc_id", "text"])
    merges = F.array(F.struct(F.lit("a").alias("a"), F.lit("a").alias("b")))
    [row] = docs.select(
        bpe_encode_tokens(F.col("text"), merges).alias("toks")
    ).collect()
    assert row["toks"] == ["aa", "aa", "aa", "a"]


def test_bpe_encode_rank_order_priority(spark):
    """Merges apply in RANK order: with table [(b,c), (a,b)] the word
    'abc' becomes [a, bc] — the higher-priority (b,c) consumes the b
    before (a,b) can see it."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        bpe_encode_tokens,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(0, "abc")], ["doc_id", "text"])
    merges = F.array(
        F.struct(F.lit("b").alias("a"), F.lit("c").alias("b")),
        F.struct(F.lit("a").alias("a"), F.lit("b").alias("b")),
    )
    [row] = docs.select(
        bpe_encode_tokens(F.col("text"), merges).alias("toks")
    ).collect()
    assert row["toks"] == ["a", "bc"]


def test_bpe_encode_rejects_delimiter_bearing_word(spark):
    """The '|' delimiter constraint is ENFORCED, not assumed: a word
    containing the reserved symbol delimiter fails the job (raise_error)
    instead of silently corrupting the symbol rendering — the silent
    path would corrupt the DuckDB oracle identically, so parity could
    never catch it."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        bpe_encode_tokens,
    )

    merges = F.array(F.struct(F.lit("a").alias("a"), F.lit("b").alias("b")))
    hostile = spark.createDataFrame([(0, "ok a|b ok")], ["doc_id", "text"])
    with pytest.raises(SparkRuntimeException, match=r"delimiter '\|'"):
        hostile.select(
            bpe_encode_tokens(F.col("text"), merges).alias("toks")
        ).collect()
    # clean input is untouched by the guard
    clean = spark.createDataFrame([(0, "abc ab")], ["doc_id", "text"])
    [row] = clean.select(
        bpe_encode_tokens(F.col("text"), merges).alias("toks")
    ).collect()
    assert row["toks"] == ["ab", "c", "ab"]


def test_bpe_merge_table_rank_is_count_then_pair(spark):
    """The one-round learned table ranks by count desc then pair asc,
    reproducibly under any partitioning."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        bpe_merge_table,
    )

    # 'ab' ×3 (aba has ab, ba; abab has ab×2, ba — wait: count exact)
    docs = spark.createDataFrame(
        [(0, "abab"), (1, "abx"), (2, "zz zz")], ["doc_id", "text"]
    ).repartition(4)
    [row] = bpe_merge_table(docs, n_merges=3).collect()
    got = [(m["a"], m["b"]) for m in row["merges"]]
    # pair counts: ab=3 (abab×2, abx), zz=2, ba=1, bx=1 → top3 by
    # (count desc, pair asc): ab, zz, ba
    assert got == [("a", "b"), ("z", "z"), ("b", "a")]


def test_seq_packing_frame_budgets_on_token_id_column(spark):
    """The packer consumes REAL tokenizer output when given a token-id
    column: budget arithmetic runs on size(token_ids), not the
    whitespace proxy."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        seq_packing_frame,
    )
    from pyspark.sql import functions as F

    rows = [
        # (doc_id, text with 2 whitespace words, token_ids of varying len)
        (0, "aa bb", list(range(5))),
        (1, "cc dd", list(range(4))),
        (2, "ee ff", list(range(3))),
        (3, "gg hh", list(range(7))),
    ]
    docs = spark.createDataFrame(
        [(d, t, ids, "s0") for d, t, ids in rows],
        ["doc_id", "text", "token_ids", "source"],
    )
    out = {
        r["doc_id"]: (r["n_tok"], r["chunk_id"])
        for r in seq_packing_frame(
            docs, budget=8, token_count=F.size("token_ids")
        ).collect()
    }
    # cumulative-before: 0,5,9,12 → chunks 0,0,1,1 on the ID counts
    assert out == {0: (5, 0), 1: (4, 0), 2: (3, 1), 3: (7, 1)}
    # whitespace proxy would have put every doc in chunk 0 (2 tokens each)
    proxy = {
        r["doc_id"]: r["chunk_id"]
        for r in seq_packing_frame(docs, budget=8).collect()
    }
    assert set(proxy.values()) == {0}


def _build_png(w, h, depth, color, raw_rows, plte=None, trns=None, interlace=0):
    """Independent TEST-SIDE PNG builder (struct+zlib only — shares no
    code with the production decoder): raw_rows is the pre-filtered
    scanline byte stream (each row prefixed with its filter byte)."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    )
    if plte is not None:
        out += chunk(b"PLTE", bytes(plte))
    if trns is not None:
        out += chunk(b"tRNS", bytes(trns))
    return out + chunk(b"IDAT", zlib.compress(raw_rows)) + chunk(b"IEND", b"")


def test_png_decoder_palette_with_trns_alpha():
    """1/2/4/8-bit palette PNGs expand through PLTE; tRNS palette alpha
    promotes the output to RGBA with 255 default beyond the table."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_png_pixels,
    )

    plte = [255, 0, 0, 0, 255, 0, 0, 0, 255]  # red, green, blue
    # 8-bit palette, 3x2: indices [[0,1,2],[2,1,0]]
    raw = b"\x00" + bytes([0, 1, 2]) + b"\x00" + bytes([2, 1, 0])
    px = decode_png_pixels(_build_png(3, 2, 8, 3, raw, plte=plte))
    assert px.shape == (2, 3, 3)
    assert px[0, 0].tolist() == [255, 0, 0] and px[1, 0].tolist() == [0, 0, 255]
    # same image at 2-bit depth: indices packed MSB-first, row = one byte
    # [0,1,2] -> 00 01 10 xx -> 0b00011000
    raw2 = b"\x00" + bytes([0b00011000]) + b"\x00" + bytes([0b10010000])
    px2 = decode_png_pixels(_build_png(3, 2, 2, 3, raw2, plte=plte))
    assert (px2 == px).all()
    # tRNS: index 0 transparent, index 1 half, index 2 defaults to 255
    pxa = decode_png_pixels(
        _build_png(3, 2, 8, 3, raw, plte=plte, trns=[0, 128])
    )
    assert pxa.shape == (2, 3, 4)
    assert pxa[0, :, 3].tolist() == [0, 128, 255]
    # out-of-range palette index is malformed, not a crash
    bad = b"\x00" + bytes([7, 0, 0]) + b"\x00" + bytes([0, 0, 0])
    assert decode_png_pixels(_build_png(3, 2, 8, 3, bad, plte=plte)) is None


def test_png_decoder_16bit_and_subbyte_gray():
    """16-bit samples downscale to their high byte; 1/2/4-bit grayscale
    scales to the full 0..255 range (PNG's sample-depth scaling)."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_png_pixels,
    )

    # 16-bit gray 2x1: samples 0x1234, 0xFF00 -> high bytes 0x12, 0xFF
    raw = b"\x00" + bytes([0x12, 0x34, 0xFF, 0x00])
    px = decode_png_pixels(_build_png(2, 1, 16, 0, raw))
    assert px.shape == (1, 2, 1) and px.ravel().tolist() == [0x12, 0xFF]
    # 16-bit RGB 1x1: (0x0102, 0xFFFE, 0x8000) -> (1, 255, 128)
    raw = b"\x00" + bytes([1, 2, 0xFF, 0xFE, 0x80, 0x00])
    px = decode_png_pixels(_build_png(1, 1, 16, 2, raw))
    assert px.ravel().tolist() == [1, 255, 128]
    # 1-bit gray 8x1: 0b10110001 -> 255/0 pattern
    raw = b"\x00" + bytes([0b10110001])
    px = decode_png_pixels(_build_png(8, 1, 1, 0, raw))
    assert px.ravel().tolist() == [255, 0, 255, 255, 0, 0, 0, 255]
    # 4-bit gray: 0xA5 -> 10, 5 -> scaled by 17 -> 170, 85
    raw = b"\x00" + bytes([0xA5])
    px = decode_png_pixels(_build_png(2, 1, 4, 0, raw))
    assert px.ravel().tolist() == [170, 85]


def test_png_decoder_adam7_interlace_matches_sequential():
    """An Adam7-interlaced image decodes to the same pixels as its
    sequential twin — passes built independently test-side, with a
    filtered (Sub) row inside one pass to prove per-pass unfiltering."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    rng = np.random.default_rng(7)
    ref = rng.integers(0, 256, (9, 10, 3), dtype=np.uint8)  # odd dims
    # sequential twin via the production encoder (already round-trips)
    seq = decode_png_pixels(encode_png(ref))
    # build the interlaced stream: Adam7 pass order, filter 0 rows
    passes = [
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = ref[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            raw += b"\x00" + sub[y].tobytes()
    px = decode_png_pixels(_build_png(10, 9, 8, 2, bytes(raw), interlace=1))
    assert px is not None and (px == ref).all() and (px == seq).all()
    # filtered row inside a pass: re-emit pass 7 rows with Sub filter
    raw2 = bytearray()
    for x0, y0, dx, dy in passes:
        sub = ref[y0::dy, x0::dx].astype(np.int32)
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            if (x0, y0) == (0, 1):  # last pass: Sub-filter the bytes
                flat = sub[y].reshape(-1)
                delta = flat.copy()
                delta[3:] = (flat[3:] - flat[:-3]) % 256
                raw2 += b"\x01" + delta.astype(np.uint8).tobytes()
            else:
                raw2 += b"\x00" + sub[y].astype(np.uint8).tobytes()
    px2 = decode_png_pixels(_build_png(10, 9, 8, 2, bytes(raw2), interlace=1))
    assert px2 is not None and (px2 == ref).all()


def test_jpeg_progressive_round_trips_equal_baseline():
    """A progressive stream transmits the SAME quantized coefficients as
    the baseline encoding, just reordered — so progressive decode must
    EQUAL baseline decode pixel-for-pixel, across grayscale, RGB, 4:2:0
    subsampling, odd (padding-exercising) dimensions and a noise image
    (dense EOB-run churn)."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    x = np.linspace(0, 4 * np.pi, 40)
    smooth = ((np.sin(x)[None, :] * np.cos(x)[:, None] * 0.5 + 0.5) * 255).astype(
        np.uint8
    )
    rgb = np.stack([smooth, smooth.T, 255 - smooth], axis=2)
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (21, 19, 3), dtype=np.uint8)  # odd dims
    cases = [
        (smooth, 85, {}),
        (rgb, 85, {}),
        (rgb, 85, {"subsample": True}),  # chroma grid ≠ luma grid
        (rgb[:37, :29], 60, {"subsample": True}),  # odd dims + padding MCUs
        (noise, 90, {}),
        (noise[:, :, 0], 35, {}),  # low quality: long zero runs, EOBn
    ]
    for px, q, kw in cases:
        base = decode_jpeg_pixels(encode_jpeg(px, q, **kw))
        blob = encode_jpeg_progressive(px, q, **kw)
        prog = decode_jpeg_pixels(blob)
        assert prog is not None and base is not None
        assert prog.shape == base.shape
        assert (prog == base).all(), (px.shape, q, kw)


def test_jpeg_progressive_refinement_corner_paths():
    """Drive _jpeg_progressive_scan with HANDCRAFTED bitstreams (bits
    derived from the spec's G.2 flowcharts by hand, independent of the
    encoder) pinning the successive-approximation corners: ZRL inside
    an AC refinement scan, a history coefficient's correction bit
    buffered across the run, a negative newly-nonzero insert, an EOBn
    (n>0) run spanning blocks, and a DC refinement bit ORed into a
    negative DC."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        _huff_decode_table,
        _jpeg_progressive_scan,
    )

    # --- AC refinement: pre-state k3=4 (history), target k23=-1 -------
    # table: symbols [0x00, 0x51, 0xF0] at 2 bits -> codes 00, 01, 10
    huff = {(1, 0): _huff_decode_table([0, 3] + [0] * 14, bytes([0x00, 0x51, 0xF0]))}
    frame = (8, 8, [(1, 1, 1, 0)])
    coef = [np.zeros((1, 1, 64), dtype=np.int32)]
    coef[0][0, 0, 3] = 4
    # bits: ZRL(10) corr(0) 0x51(01) sign(0=neg) EOB0(00) -> 0x88
    ok = _jpeg_progressive_scan(
        frame, coef, [(0, 0, 0)], 1, 63, 1, 0, [bytes([0x88])], huff, 0
    )
    assert ok
    expect = np.zeros(64, dtype=np.int32)
    expect[3], expect[23] = 4, -1
    assert (coef[0][0, 0] == expect).all()

    # --- AC first with an EOBn (n=1) run spanning two blocks ----------
    # table: symbols [0x03, 0x10] at 2 bits -> codes 00, 01
    huff = {(1, 0): _huff_decode_table([0, 2] + [0] * 14, bytes([0x03, 0x10]))}
    frame = (8, 16, [(1, 1, 1, 0)])
    coef = [np.zeros((1, 2, 64), dtype=np.int32)]
    # bits: 0x03(00) value 5(101) 0x10(01) appended-bit(0) -> 0x2A
    ok = _jpeg_progressive_scan(
        frame, coef, [(0, 0, 0)], 1, 63, 0, 0, [bytes([0x2A])], huff, 0
    )
    assert ok
    assert coef[0][0, 0, 1] == 5 and not coef[0][0, 0, 2:].any()
    assert not coef[0][0, 1].any()  # second block consumed by the EOB run

    # --- DC refinement ORs the Al bit into a NEGATIVE DC --------------
    frame = (8, 8, [(1, 1, 1, 0)])
    coef = [np.zeros((1, 1, 64), dtype=np.int32)]
    coef[0][0, 0, 0] = -6  # first DC scan stored (-5 >> 1) << 1
    ok = _jpeg_progressive_scan(
        frame, coef, [(0, 0, 0)], 0, 0, 1, 0, [bytes([0x80])], huff, 0
    )
    assert ok
    assert coef[0][0, 0, 0] == -5  # -6 | 1 in two's complement


def test_jpeg_progressive_truncation_never_crashes():
    """Every prefix of a progressive stream decodes to None or an image,
    never an exception — the malformed-payload contract all the stdlib
    codecs follow."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (17, 13, 3), dtype=np.uint8)
    blob = encode_jpeg_progressive(px, 75)
    for cut in list(range(0, len(blob), 7)) + [len(blob) - 1]:
        decode_jpeg_pixels(blob[:cut])  # must not raise
    # corrupting a scan's marker byte must also fail closed
    mut = bytearray(blob)
    mut[len(mut) // 2] = 0xFF
    decode_jpeg_pixels(bytes(mut))


def _wav_blob(fmt_code, n_ch, rate, bits, block_align, data, fact_frames=None):
    import struct

    byte_rate = rate * n_ch * max(bits, 1) // 8
    fmt = struct.pack("<HHIIHH", fmt_code, n_ch, rate, byte_rate, block_align, bits)
    fact = (
        b"fact" + struct.pack("<II", 4, fact_frames)
        if fact_frames is not None
        else b""
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(fact) + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_wav_g711_ulaw_alaw_decode():
    """G.711 companded WAVs decode through the ITU expansion tables —
    spot-checked against hand-computed table entries, then round-tripped
    through independent TEST-SIDE compressors within G.711's quantization
    error envelope."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_wav_samples,
    )

    # hand-computed ITU values: µ-law 0x00 → −32124, 0x80 → +32124,
    # 0xFF → 0;  A-law 0x2A → −32256, 0xAA → +32256, 0x55 → −8
    out = decode_wav_samples(
        _wav_blob(7, 1, 8000, 8, 1, bytes([0x00, 0x80, 0xFF]))
    )
    assert np.allclose(out.ravel() * 32768.0, [-32124, 32124, 0])
    out = decode_wav_samples(
        _wav_blob(6, 1, 8000, 8, 1, bytes([0x2A, 0xAA, 0x55]))
    )
    assert np.allclose(out.ravel() * 32768.0, [-32256, 32256, -8])

    # independent test-side µ-law compressor (ITU search over the table)
    def ulaw_compress(x16):
        bias, out = 0x84, []
        for v in x16:
            sign = 0x80 if v < 0 else 0
            v = min(abs(int(v)), 32635) + bias
            exp = v.bit_length() - 8  # segment: top set bit above bit 7
            mant = (v >> (exp + 3)) & 0x0F
            out.append(~(sign | (exp << 4) | mant) & 0xFF)
        return bytes(out)

    t = np.arange(800)
    wave = (np.sin(2 * np.pi * t / 80) * 20000).astype(np.int64)
    dec = decode_wav_samples(
        _wav_blob(7, 1, 8000, 8, 1, ulaw_compress(wave))
    )
    err = np.abs(dec.ravel() * 32768.0 - wave)
    # µ-law quantization error grows with segment: the truncating
    # test-side compressor errs by at most one segment-7 step (1024)
    assert err.max() <= 1024
    # and small-amplitude samples must be near-exact (segment-0 steps)
    small = np.abs(wave) < 100
    assert err[small].max() <= 8
    # stereo shaping
    st = decode_wav_samples(_wav_blob(7, 2, 8000, 8, 2, bytes(range(64))))
    assert st.shape == (32, 2)


def test_wav_ima_adpcm_decode():
    """IMA ADPCM blocks decode via the reference step/index tables —
    round-tripped through an independent TEST-SIDE IMA compressor; the
    decoded waveform must track the original within ADPCM's adaptive
    step error, and the block header predictor must be emitted as the
    first sample."""
    import struct

    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        _IMA_INDEX_TABLE,
        _IMA_STEP_TABLE,
        decode_wav_samples,
    )

    def ima_compress(x16, n_ch, block_align):
        # standard IMA encoder: quantize diff against the adaptive step
        per_ch = [x16[:, c].tolist() for c in range(n_ch)]
        n = len(per_ch[0])
        samples_per_block = (block_align - 4 * n_ch) * 2 // n_ch + 1
        out = bytearray()
        pos = 0
        pred = [0] * n_ch
        idx = [0] * n_ch
        while pos < n:
            for c in range(n_ch):
                pred[c] = per_ch[c][pos]
                out += struct.pack("<hBB", pred[c], idx[c], 0)
            nibs = [[] for _ in range(n_ch)]
            for i in range(1, samples_per_block):
                for c in range(n_ch):
                    v = per_ch[c][pos + i] if pos + i < n else pred[c]
                    step = _IMA_STEP_TABLE[idx[c]]
                    delta = v - pred[c]
                    nib = 8 if delta < 0 else 0
                    delta = abs(delta)
                    if delta >= step:
                        nib |= 4
                        delta -= step
                    if delta >= step >> 1:
                        nib |= 2
                        delta -= step >> 1
                    if delta >= step >> 2:
                        nib |= 1
                    # reconstruct exactly like the decoder
                    diff = step >> 3
                    if nib & 1:
                        diff += step >> 2
                    if nib & 2:
                        diff += step >> 1
                    if nib & 4:
                        diff += step
                    p = pred[c] - diff if nib & 8 else pred[c] + diff
                    pred[c] = max(-32768, min(32767, p))
                    idx[c] = max(0, min(88, idx[c] + _IMA_INDEX_TABLE[nib & 7]))
                    nibs[c].append(nib)
            # pack per channel in 8-nibble groups, channel-interleaved
            for g in range(len(nibs[0]) // 8):
                for c in range(n_ch):
                    grp = nibs[c][g * 8 : g * 8 + 8]
                    for j in range(0, 8, 2):
                        out.append(grp[j] | (grp[j + 1] << 4))
            pos += samples_per_block
        return bytes(out)

    t = np.arange(1024)
    mono = (np.sin(2 * np.pi * t / 64) * 12000).astype(np.int64)[:, None]
    blob = _wav_blob(0x11, 1, 8000, 4, 256, ima_compress(mono, 1, 256))
    dec = decode_wav_samples(blob)
    n = min(len(dec), len(mono))
    err = np.abs(dec[:n, 0] * 32768.0 - mono[:n, 0])
    assert err.mean() < 600  # adaptive-step tracking error, not garbage
    assert abs(dec[0, 0] * 32768.0 - mono[0, 0]) < 1  # header predictor
    # stereo: L = wave, R = inverted wave; channels must not swap
    stereo = np.concatenate([mono, -mono], axis=1)
    blob = _wav_blob(0x11, 2, 8000, 4, 512, ima_compress(stereo, 2, 512))
    dec = decode_wav_samples(blob)
    n = min(len(dec), len(stereo))
    assert np.abs(dec[:n, 0] * 32768.0 - stereo[:n, 0]).mean() < 600
    assert np.abs(dec[:n, 1] * 32768.0 - stereo[:n, 1]).mean() < 600
    # malformed: step index out of range fails closed
    bad = _wav_blob(0x11, 1, 8000, 4, 8, struct.pack("<hBB", 0, 99, 0) + b"\x00" * 4)
    assert decode_wav_samples(bad) is None


def test_wav_adpcm_fact_chunk_bounds_phantom_padding_samples():
    """A stream whose length is not a whole number of ADPCM blocks pads
    the final block's nibble area; the fact chunk's declared frame count
    must bound the decode — without it the padding decodes as phantom
    trailing samples and skews rms/zero-crossing stats."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        _IMA_INDEX_TABLE,
        _IMA_STEP_TABLE,
        decode_wav_samples,
    )

    # independent test-side compressor (same as the round-trip test, but
    # fed FEWER samples than one block holds so the encoder pads)
    import struct as _struct

    def ima_compress(x16, n_ch, block_align):
        per_ch = [x16[:, c].tolist() for c in range(n_ch)]
        n = len(per_ch[0])
        samples_per_block = (block_align - 4 * n_ch) * 2 // n_ch + 1
        out = bytearray()
        pos = 0
        pred = [0] * n_ch
        idx = [0] * n_ch
        while pos < n:
            for c in range(n_ch):
                pred[c] = per_ch[c][pos]
                out += _struct.pack("<hBB", pred[c], idx[c], 0)
            nibs = [[] for _ in range(n_ch)]
            for i in range(1, samples_per_block):
                for c in range(n_ch):
                    v = per_ch[c][pos + i] if pos + i < n else pred[c]
                    step = _IMA_STEP_TABLE[idx[c]]
                    delta = v - pred[c]
                    nib = 8 if delta < 0 else 0
                    delta = abs(delta)
                    if delta >= step:
                        nib |= 4
                        delta -= step
                    if delta >= step >> 1:
                        nib |= 2
                        delta -= step >> 1
                    if delta >= step >> 2:
                        nib |= 1
                    diff = step >> 3
                    if nib & 1:
                        diff += step >> 2
                    if nib & 2:
                        diff += step >> 1
                    if nib & 4:
                        diff += step
                    p = pred[c] - diff if nib & 8 else pred[c] + diff
                    pred[c] = max(-32768, min(32767, p))
                    idx[c] = max(0, min(88, idx[c] + _IMA_INDEX_TABLE[nib & 7]))
                    nibs[c].append(nib)
            for g in range(len(nibs[0]) // 8):
                for c in range(n_ch):
                    grp = nibs[c][g * 8 : g * 8 + 8]
                    for j in range(0, 8, 2):
                        out.append(grp[j] | (grp[j + 1] << 4))
            pos += samples_per_block
        return bytes(out)

    t = np.arange(300)  # one 256-byte mono block holds 505 samples
    mono = (np.sin(2 * np.pi * t / 64) * 12000).astype(np.int64)[:, None]
    data = ima_compress(mono, 1, 256)
    # without fact: the padded nibbles decode as phantom trailing samples
    dec_nofact = decode_wav_samples(_wav_blob(0x11, 1, 8000, 4, 256, data))
    assert len(dec_nofact) == 505
    # with fact: decode is bounded to the declared 300 frames
    dec = decode_wav_samples(
        _wav_blob(0x11, 1, 8000, 4, 256, data, fact_frames=300)
    )
    assert len(dec) == 300
    assert np.abs(dec[:, 0] * 32768.0 - mono[:, 0]).mean() < 600
    # the G.711 path honors a declared shorter count too
    dec_g711 = decode_wav_samples(
        _wav_blob(7, 1, 8000, 8, 1, bytes([0xFF] * 10), fact_frames=7)
    )
    assert len(dec_g711) == 7


def test_decode_video_mjpeg_avi_frames():
    """An MJPEG AVI decodes frame-by-frame through the stdlib JPEG
    codec: a handcrafted RIFF 'AVI ' with hdrl + movi carrying three
    JPEG frames (one of them PROGRESSIVE) yields three pixel arrays in
    stream order; non-MJPEG video chunks stay gated."""
    import struct

    import numpy as np
    import pytest

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_mjpeg_frames,
        decode_video,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    frames_px = [
        np.full((16, 16, 3), 40, dtype=np.uint8),
        np.full((16, 16, 3), 120, dtype=np.uint8),
        np.full((16, 16, 3), 200, dtype=np.uint8),
    ]
    payloads = [
        encode_jpeg(frames_px[0], 95),
        encode_jpeg_progressive(frames_px[1], 95),
        encode_jpeg(frames_px[2], 95),
    ]
    movi_body = b"movi" + b"".join(chunk(b"00dc", p) for p in payloads)
    avih_body = struct.pack("<14I", 40_000, 0, 0, 0x10, 3, 0, 1, 0, 16, 16,
                            0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih_body))
    movi = chunk(b"LIST", movi_body)
    riff_body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body

    frames = decode_video(avi)
    assert len(frames) == 3
    for got, want in zip(frames, frames_px):
        assert got.shape == (16, 16, 3)
        # flat-color frames survive JPEG within quantization tolerance
        assert abs(got.astype(int).mean() - want.astype(int).mean()) < 3
    # non-JPEG video chunks: recognized as AVI but stay gated
    movi2 = chunk(b"LIST", b"movi" + chunk(b"00dc", b"\x00\x01\x02\x03"))
    riff2 = b"AVI " + hdrl + movi2
    bad = b"RIFF" + struct.pack("<I", len(riff2)) + riff2
    assert decode_mjpeg_frames(bad) is None
    with pytest.raises(NotImplementedError):
        decode_video(bad)
    assert decode_mjpeg_frames(b"RIFF\x00\x00\x00\x00WAVE") is None


def test_bmp_pixel_decode_profiles():
    """Handcrafted BMPs: 24-bit bottom-up BGR, 32-bit top-down BGRX,
    8-bit palette, 4-bit palette packing, and BI_RLE8 runs/absolute/EOL
    — all decode to exact pixels; unsupported profiles return None."""
    import struct

    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_bmp_pixels,
    )

    def bmp(w, h, bpp, compression, pal, pixel_bytes):
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, compression,
            len(pixel_bytes), 2835, 2835, len(pal), 0,
        )
        pal_bytes = b"".join(bytes([b, g, r, 0]) for r, g, b in pal)
        off = 14 + len(dib) + len(pal_bytes)
        hdr = b"BM" + struct.pack("<IHHI", off + len(pixel_bytes), 0, 0, off)
        return hdr + dib + pal_bytes + pixel_bytes

    # 24-bit 2x2 bottom-up: rows padded to 4 bytes (2*3=6 -> 8)
    # file row 0 (image BOTTOM row): red, green; row 1 (top): blue, white
    rows = (
        bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"
        + bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"
    )
    px = decode_bmp_pixels(bmp(2, 2, 24, 0, [], rows))
    assert px.shape == (2, 2, 3)
    assert px[0].tolist() == [[0, 0, 255], [255, 255, 255]]  # top row
    assert px[1].tolist() == [[255, 0, 0], [0, 255, 0]]  # bottom row

    # 32-bit TOP-DOWN (negative height): BGRX, no padding needed
    rows32 = bytes([10, 20, 30, 0, 40, 50, 60, 0])
    px = decode_bmp_pixels(bmp(2, -1, 32, 0, [], rows32))
    assert px.shape == (1, 2, 3)
    assert px[0].tolist() == [[30, 20, 10], [60, 50, 40]]

    # 8-bit palette 3x1: indices 2,0,1 -> padded to 4
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    px = decode_bmp_pixels(bmp(3, -1, 8, 0, pal, bytes([2, 0, 1, 0])))
    assert px[0].tolist() == [[0, 0, 255], [255, 0, 0], [0, 255, 0]]

    # 4-bit palette 3x1: nibbles 2,0 | 1,pad -> 0x20 0x10 + 2 pad bytes
    px = decode_bmp_pixels(bmp(3, -1, 4, 0, pal, bytes([0x20, 0x10, 0, 0])))
    assert px[0].tolist() == [[0, 0, 255], [255, 0, 0], [0, 255, 0]]

    # BI_RLE8 4x2 top... (RLE is bottom-up): run 3x idx1, literal? use
    # encoded runs: row0: (3,1)(1,0) EOL; row1: absolute 4 bytes EOL EOB
    rle = bytes(
        [3, 1, 1, 0, 0, 0]  # 3x pal1, 1x pal0, end-of-line
        + [0, 4, 2, 2, 0, 0, 0, 0]  # absolute: 4 literals 2,2,0,0
        + [0, 1]  # end of bitmap
    )
    px = decode_bmp_pixels(bmp(4, 2, 8, 1, pal, rle))
    assert px.shape == (2, 4, 3)
    # bottom-up: file row 0 is the image BOTTOM
    assert px[1].tolist() == [[0, 255, 0]] * 3 + [[255, 0, 0]]
    assert px[0].tolist() == [[0, 0, 255]] * 2 + [[255, 0, 0]] * 2

    # unsupported: BITFIELDS compression, out-of-range palette index
    assert decode_bmp_pixels(bmp(2, 2, 32, 3, [], rows32 * 2)) is None
    assert decode_bmp_pixels(bmp(3, -1, 8, 0, pal, bytes([7, 0, 1, 0]))) is None
    assert decode_bmp_pixels(b"BMshort") is None


def test_tiff_pixel_decode_profiles():
    """Handcrafted TIFFs: little/big endian, RGB strips, white-is-zero
    grayscale inversion, PackBits compression, 16-bit colormap palette —
    exact pixels; LZW and non-8-bit profiles return None."""
    import struct

    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        decode_tiff_pixels,
    )

    def tiff(bo, entries, blobs, blob_base):
        # entries: list of (tag, typ, values); blobs appended after IFD
        ifd_off = 8
        n = len(entries)
        out = bytearray()
        out += (b"II*\x00" if bo == "<" else b"MM\x00*")
        out += struct.pack(bo + "I", ifd_off)
        out += struct.pack(bo + "H", n)
        fmt = {1: "B", 3: "H", 4: "I"}
        size = {1: 1, 3: 2, 4: 4}
        for tag, typ, vals in entries:
            out += struct.pack(bo + "HH", tag, typ)
            out += struct.pack(bo + "I", len(vals))
            packed = struct.pack(bo + fmt[typ] * len(vals), *vals)
            if len(packed) <= 4:
                out += packed + b"\x00" * (4 - len(packed))
            else:
                out += struct.pack(bo + "I", blob_base + blobs.index(packed))
        out += struct.pack(bo + "I", 0)  # next IFD
        return out

    # RGB 2x2, one uncompressed strip, little-endian
    strip = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    base = 8 + 2 + 8 * 12 + 4
    entries = [
        (256, 3, [2]), (257, 3, [2]), (258, 3, [8, 8, 8]),
        (259, 3, [1]), (262, 3, [2]), (273, 4, [base + 6]),
        (277, 3, [3]), (279, 4, [len(strip)]),
    ]
    blob258 = struct.pack("<HHH", 8, 8, 8)
    payload = bytes(tiff("<", entries, [blob258], base)) + blob258 + strip
    px = decode_tiff_pixels(payload)
    assert px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0] and px[1, 1].tolist() == [9, 9, 9]

    # grayscale 4x1 white-is-zero, big-endian: values invert
    strip = bytes([0, 64, 128, 255])
    base = 8 + 2 + 7 * 12 + 4
    entries = [
        (256, 3, [4]), (257, 3, [1]), (258, 3, [8]),
        (259, 3, [1]), (262, 3, [0]), (273, 4, [base]),
        (279, 4, [4]),
    ]
    px = decode_tiff_pixels(bytes(tiff(">", entries, [], base)) + strip)
    assert px[:, :, 0].ravel().tolist() == [255, 191, 127, 0]

    # PackBits grayscale 8x1: run of 5x7 + literal 3 bytes
    pb = bytes([256 - 4, 7, 2, 1, 2, 3])  # repeat 7 x5, literal [1,2,3]
    base = 8 + 2 + 7 * 12 + 4
    entries = [
        (256, 3, [8]), (257, 3, [1]), (258, 3, [8]),
        (259, 3, [32773]), (262, 3, [1]), (273, 4, [base]),
        (279, 4, [len(pb)]),
    ]
    px = decode_tiff_pixels(bytes(tiff("<", entries, [], base)) + pb)
    assert px[:, :, 0].ravel().tolist() == [7, 7, 7, 7, 7, 1, 2, 3]

    # palette 2x1: colormap planes R,G,B of 256 uint16 (value*257)
    cmap_vals = [0] * 768
    cmap_vals[1] = 255 * 257  # R plane idx1 -> red
    cmap_vals[256 + 2] = 200 * 257  # G plane idx2
    cmap = struct.pack("<768H", *cmap_vals)
    strip = bytes([1, 2])
    base = 8 + 2 + 8 * 12 + 4
    entries = [
        (256, 3, [2]), (257, 3, [1]), (258, 3, [8]),
        (259, 3, [1]), (262, 3, [3]), (273, 4, [base + len(cmap)]),
        (279, 4, [2]), (320, 3, cmap_vals),
    ]
    px = decode_tiff_pixels(bytes(tiff("<", entries, [cmap], base)) + cmap + strip)
    assert px[0, 0].tolist() == [255, 0, 0] and px[0, 1].tolist() == [0, 200, 0]

    # LZW whose stream does not begin with the mandated ClearCode
    # (here: all-zero bytes) fails closed
    entries = [
        (256, 3, [2]), (257, 3, [1]), (258, 3, [8]),
        (259, 3, [5]), (262, 3, [1]), (273, 4, [200]),
        (279, 4, [2]),
    ]
    assert decode_tiff_pixels(bytes(tiff("<", entries, [], 200)) + b"\x00" * 300) is None
    assert decode_tiff_pixels(b"II*\x00\x08") is None

    # unsupported: PLANAR (PlanarConfiguration=2) RGB meets every other
    # accepted-profile check but would decode channel-scrambled — must
    # fail closed, not return wrong pixels
    strip = bytes(12)
    base = 8 + 2 + 9 * 12 + 4
    entries = [
        (256, 3, [2]), (257, 3, [2]), (258, 3, [8, 8, 8]),
        (259, 3, [1]), (262, 3, [2]), (273, 4, [base + 6]),
        (277, 3, [3]), (279, 4, [len(strip)]), (284, 3, [2]),
    ]
    blob258 = struct.pack("<HHH", 8, 8, 8)
    payload = bytes(tiff("<", entries, [blob258], base)) + blob258 + strip
    assert decode_tiff_pixels(payload) is None
    # planar tag on a SINGLE-sample image is layout-equivalent to chunky
    # and still decodes
    strip = bytes([0, 64, 128, 255])
    base = 8 + 2 + 8 * 12 + 4
    entries = [
        (256, 3, [4]), (257, 3, [1]), (258, 3, [8]),
        (259, 3, [1]), (262, 3, [1]), (273, 4, [base]),
        (279, 4, [4]), (284, 3, [2]),
    ]
    px = decode_tiff_pixels(bytes(tiff("<", entries, [], base)) + strip)
    assert px[:, :, 0].ravel().tolist() == [0, 64, 128, 255]


def test_parse_image_dims_tiff():
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        parse_image_dims,
    )
    import struct

    ifd = struct.pack("<H", 2)
    ifd += struct.pack("<HHI", 256, 3, 1) + struct.pack("<H", 640) + b"\x00\x00"
    ifd += struct.pack("<HHI", 257, 4, 1) + struct.pack("<I", 480)
    ifd += struct.pack("<I", 0)
    blob = b"II*\x00" + struct.pack("<I", 8) + ifd
    assert parse_image_dims(blob) == (640, 480, "TIFF")
    assert parse_image_dims(b"II*\x00\x08\x00\x00\x00") is None


def test_resize_image_stdlib_formats_resample_to_png():
    """Without PIL, resize decodes ANY stdlib-decodable format and
    re-encodes as PNG — a flat-color JPEG resamples to the same color,
    and a GIF's palette pixels survive the index-map resample."""
    import numpy as np

    from ida_ice_energy_simulation_etl_pipeline_spark.operators import multimodal as M

    if M.HAS_PIL:
        import pytest

        pytest.skip("stdlib resample path only runs without PIL")
    flat = np.full((16, 16, 3), 77, dtype=np.uint8)
    out = M.decode_png_pixels(M.resize_image(M.encode_jpeg(flat, 95), 4, 4))
    assert out.shape == (4, 4, 3)
    assert abs(out.astype(int).mean() - 77) < 3  # JPEG-lossy tolerance


def test_bpe_train_recounts_after_each_merge(spark):
    """True iterative training: round 2's winning pair has round 1's
    OUTPUT as an operand — a property one counting round can never
    produce (bpe_merge_candidates' documented gap)."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        bpe_train_frame,
    )

    # 'aaaa' x10: round 1 counts (a,a)=30 and merges it -> streams
    # become [aa, aa]; round 2's recount sees (aa, aa)=10 — an operand
    # that did not EXIST before round 1.  'xy' x4 is the decoy: a
    # single-round top-2 would pick (x,y)=4 second, never (aa,aa).
    rows = [(i, "aaaa", "s") for i in range(10)] + [
        (100 + i, "xy", "s") for i in range(4)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"]).repartition(4)
    got = [
        (r["rank"], r["a"], r["b"], r["n"])
        for r in bpe_train_frame(docs, n_merges=3).orderBy("rank").collect()
    ]
    # word-frequency weighting: 'aaaa' count 10 -> (a,a) pairs 3*10=30
    assert got[0] == (1, "a", "a", 30)
    assert got[1] == (2, "aa", "aa", 10)
    assert got[2] == (3, "x", "y", 4)


def test_bpe_train_tie_break_is_lexicographic(spark):
    """Equal-count pairs resolve by (a, b) ordering, reproducibly under
    any partitioning — the cross-engine tie-break the oracle mirrors."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        bpe_train_frame,
    )

    rows = [(0, "zw zw", "s"), (1, "bc bc", "s")]  # (z,w)=2 ties (b,c)=2
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"]).repartition(3)
    got = [
        (r["a"], r["b"])
        for r in bpe_train_frame(docs, n_merges=1).collect()
    ]
    assert got == [("b", "c")]


# --------------------------------------------------------------------------
# Round-10 operator semantics on PLANTED inputs (the oracle-parity sweep
# proves cross-engine agreement; these prove the answers are RIGHT).


def test_zipf_fit_recovers_planted_exponent(spark):
    """A corpus built to follow freq = C·rank^(-0.8) exactly must fit
    slope ≈ -0.8 with R² ≈ 1."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        zipf_fit,
    )

    words = []
    for rank in range(1, 41):
        n = max(1, round(2000 * rank ** -0.8))
        words.extend([f"w{rank:03d}"] * n)
    docs = spark.createDataFrame(
        [(1, " ".join(words), "en", "s1", len(words))],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        row = zipf_fit(spark, d).collect()[0]
    # rounding of counts bends the tail slightly; the fit must still
    # land on the planted exponent
    assert abs(row["zipf_slope"] - (-0.8)) < 0.02, row["zipf_slope"]
    assert row["r2"] > 0.999, row["r2"]


def test_pagerank_mass_conserved_and_hub_ranks_first(spark):
    """On a star graph the hub must out-rank every leaf; total rank mass
    stays ≈ 1 (the damping identity — no dangling nodes here)."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.graph import (
        pagerank_frame,
    )

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], ["src", "dst"]
    )
    pr = {r["vertex"]: r["pr"] for r in pagerank_frame(edges).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-6
    hub, leaves = pr[0], [pr[i] for i in range(1, 9)]
    assert all(hub > l for l in leaves)
    # symmetry: all leaves identical
    assert max(leaves) - min(leaves) < 1e-12


def test_rake_scores_match_hand_computation(spark):
    """RAKE on a two-document corpus with hand-computable degree/freq
    scores."""
    import os
    import tempfile

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        rake_keywords,
    )

    # Candidate phrases (split at 'the'/'a'):
    #   doc1: "red fox", "red dog"     doc2: "red fox"
    # freq: red=3, fox=2, dog=1 ; deg (sum of phrase lengths containing
    # the word, multiplicity): red=6, fox=4, dog=2
    # wscore: red=2, fox=2, dog=2 → "red fox"=4.0 (×2 occurrences),
    # "red dog"=4.0 (×1)
    docs = spark.createDataFrame(
        [
            (1, "the red fox a red dog", "en", "s1", 21),
            (2, "a red fox", "en", "s2", 9),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        rows = {
            r["phrase"]: r for r in rake_keywords(spark, d).collect()
        }
    assert rows["red fox"]["rake_score"] == 4.0
    assert rows["red fox"]["n_occurrences"] == 2
    assert rows["red dog"]["rake_score"] == 4.0
    assert rows["red dog"]["n_occurrences"] == 1


def test_source_divergence_zero_for_identical_disjoint_positive(spark):
    """A source distributed exactly like the corpus mixture diverges by
    0; a source with disjoint vocabulary hits the JS ceiling ln 2 (its
    own mass) minus the shared-mixture correction — strictly positive
    and larger than any overlapping source."""
    import os
    import tempfile

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        source_divergence,
    )

    # s1 and s2: identical distributions → each vs the (s1+s2) mixture
    # of THEMSELVES is 0.  s3: disjoint vocabulary.
    docs = spark.createDataFrame(
        [
            (1, "x x y", "en", "s1", 5),
            (2, "x x y", "en", "s2", 5),
            (3, "q r r", "en", "s3", 5),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        rows = {
            r["source"]: r for r in source_divergence(spark, d).collect()
        }
    # s1 == s2, and s3's divergence strictly dominates both
    assert rows["s1"]["js_divergence"] == rows["s2"]["js_divergence"]
    assert rows["s3"]["js_divergence"] > rows["s1"]["js_divergence"] > 0
    assert rows["s3"]["kl_divergence"] > rows["s1"]["kl_divergence"]


def test_retention_cohorts_two_planted_cohorts(spark):
    """Two cohorts with known week-over-week activity: a week-1 cohort
    of two users (one returns in week 2), and a week-2 cohort of one
    user (never returns)."""
    import os
    import tempfile
    from datetime import datetime

    from ida_ice_energy_simulation_etl_pipeline_spark.plans.analytics import (
        retention_cohorts,
    )

    # 2024-03-04 and 2024-03-11 are Mondays.
    def ev(i, day, user):
        return (i, datetime(2024, 3, day, 12, 0, 0), user, "click", 1.0, "{}")

    events = spark.createDataFrame(
        [
            ev(1, 4, 100), ev(2, 5, 200),      # cohort A (week of 03-04)
            ev(3, 11, 100),                     # user 100 returns week 2
            ev(4, 12, 300),                     # cohort B (week of 03-11)
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    with tempfile.TemporaryDirectory() as d:
        events.write.parquet(os.path.join(d, "events.parquet"))
        rows = {
            (str(r["cohort_week"]), r["week_offset"]): r
            for r in retention_cohorts(spark, d).collect()
        }
    a0 = rows[("2024-03-04", 0)]
    a1 = rows[("2024-03-04", 1)]
    b0 = rows[("2024-03-11", 0)]
    assert (a0["n_active"], a0["cohort_size"], a0["retention_pct"]) == (2, 2, 100.0)
    assert (a1["n_active"], a1["cohort_size"], a1["retention_pct"]) == (1, 2, 50.0)
    assert (b0["n_active"], b0["cohort_size"], b0["retention_pct"]) == (1, 1, 100.0)
    assert len(rows) == 3


def test_bpe_fertility_single_merge_hand_check(spark):
    """One dominant pair → the self-derived table's top merge halves the
    tokens of words made of that pair; fertility reflects it exactly."""
    import os
    import tempfile

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        bpe_fertility,
    )

    # 'abab' dominates: pairs ab (x2 per word), ba (x1).  With 12 merge
    # slots the table learns ab, then abab→(ab)(ab) etc.; exact token
    # counts are pinned by the oracle sweep — here pin the INVARIANTS:
    # fertility = n_tokens/n_words and chars/token = chars/n_tokens.
    docs = spark.createDataFrame(
        [(1, "abab abab cd", "en", "s1", 12)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        row = bpe_fertility(spark, d).collect()[0]
    assert row["n_words"] == 3
    assert row["fertility"] == round(row["n_tokens"] / row["n_words"], 4)
    # 10 non-space chars
    assert row["chars_per_token"] == round(10 / row["n_tokens"], 4)
    # 'abab' fully merges into one or two symbols depending on rank
    # interaction; it must at least HALVE vs character grain (8 chars)
    assert row["n_tokens"] <= 8


def _build_ifd(entries, ifd_off, bo):
    """Minimal TIFF IFD builder for EXIF tests: entries are
    (tag, typ, count, raw_value_bytes); >4-byte values land in a data
    area directly after the entry table.  Returns the IFD block bytes
    (caller places it at ifd_off)."""
    import struct

    out = struct.pack(bo + "H", len(entries))
    data = b""
    data_base = ifd_off + 2 + 12 * len(entries) + 4
    for tag, typ, count, raw in entries:
        out += struct.pack(bo + "HHI", tag, typ, count)
        if len(raw) <= 4:
            out += raw.ljust(4, b"\x00")
        else:
            out += struct.pack(bo + "I", data_base + len(data))
            data += raw
    out += struct.pack(bo + "I", 0)  # no next IFD
    return out + data


def _build_exif_tiff(bo):
    """A deterministic EXIF TIFF blob: IFD0 (make/model/orientation +
    Exif/GPS pointers), Exif IFD (exposure/fnumber/iso/pixel_x), GPS IFD
    (N 40d26m46s, W 79d58m56s)."""
    import struct

    def rat(*pairs):
        return b"".join(struct.pack(bo + "II", n, d) for n, d in pairs)

    header = (b"II*\x00" if bo == "<" else b"MM\x00*") + struct.pack(bo + "I", 8)
    # IFD0: 5 entries, 2+60+4 = 66 bytes + 6 data ("Canon\0") = 72 → next at 80
    ifd0_entries = lambda off_exif, off_gps: [
        (271, 2, 6, b"Canon\x00"),
        (272, 2, 4, b"EOS\x00"),
        (274, 3, 1, struct.pack(bo + "H", 6)),
        (34665, 4, 1, struct.pack(bo + "I", off_exif)),
        (34853, 4, 1, struct.pack(bo + "I", off_gps)),
    ]
    off_exif = 8 + 66 + 6
    exif_entries = [
        (33434, 5, 1, rat((1, 250))),
        (33437, 5, 1, rat((28, 10))),
        (34855, 3, 1, struct.pack(bo + "H", 400)),
        (40962, 4, 1, struct.pack(bo + "I", 33)),
    ]
    exif_block = _build_ifd(exif_entries, off_exif, bo)
    off_gps = off_exif + len(exif_block)
    gps_entries = [
        (1, 2, 2, b"N\x00"),
        (2, 5, 3, rat((40, 1), (26, 1), (46, 1))),
        (3, 2, 2, b"W\x00"),
        (4, 5, 3, rat((79, 1), (58, 1), (56, 1))),
    ]
    blob = (
        header
        + _build_ifd(ifd0_entries(off_exif, off_gps), 8, bo)
        + exif_block
        + _build_ifd(gps_entries, off_gps, bo)
    )
    return blob


@pytest.mark.parametrize("bo", ["<", ">"])
def test_parse_exif_both_byte_orders(bo):
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        parse_exif,
    )

    got = parse_exif(_build_exif_tiff(bo))
    assert got is not None
    assert got["make"] == "Canon" and got["model"] == "EOS"
    assert got["orientation"] == 6
    assert got["exposure_time"] == 1 / 250
    assert got["f_number"] == 2.8
    assert got["iso"] == 400
    assert got["pixel_x"] == 33
    assert got["gps_lat"] == round(40 + 26 / 60 + 46 / 3600, 7)
    assert got["gps_lon"] == -round(79 + 58 / 60 + 56 / 3600, 7)


def test_parse_exif_jpeg_app1_and_negatives():
    """The APP1 'Exif\\0\\0' wrapper parses identically; a JPEG without
    EXIF and a non-image payload return None."""
    import struct

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        parse_exif,
    )

    blob = _build_exif_tiff("<")
    app1 = b"Exif\x00\x00" + blob
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe1"
        + struct.pack(">H", 2 + len(app1))
        + app1
        + b"\xff\xd9"
    )
    got = parse_exif(jpeg)
    assert got is not None and got["make"] == "Canon" and got["iso"] == 400
    assert parse_exif(b"\xff\xd8\xff\xd9") is None  # JPEG, no EXIF
    assert parse_exif(b"not an image") is None


def _build_exif_tiff_multicount(bo="<"):
    """A quirky-but-real blob where scalar-schema fields carry count>1:
    orientation SHORT×2 and exposure_time RATIONAL×2.  parse_exif must
    unwrap to the first element (not return a Python list that breaks
    the Arrow batch downstream)."""
    import struct

    def rat(*pairs):
        return b"".join(struct.pack(bo + "II", n, d) for n, d in pairs)

    header = (b"II*\x00" if bo == "<" else b"MM\x00*") + struct.pack(bo + "I", 8)
    ifd0_entries = lambda off_exif: [
        (271, 2, 6, b"Canon\x00"),
        (274, 3, 2, struct.pack(bo + "HH", 6, 1)),  # orientation, count=2
        (34665, 4, 1, struct.pack(bo + "I", off_exif)),
    ]
    # IFD0: 2 + 3*12 + 4 = 42 bytes + 6 data = 48 → exif IFD at 8+48
    off_exif = 8 + 42 + 6
    exif_entries = [
        (33434, 5, 2, rat((1, 250), (1, 125))),  # exposure_time, count=2
        (34855, 3, 2, struct.pack(bo + "HH", 400, 800)),  # iso, count=2
    ]
    return (
        header
        + _build_ifd(ifd0_entries(off_exif), 8, bo)
        + _build_ifd(exif_entries, off_exif, bo)
    )


@pytest.mark.parametrize("d", [0, 1, 6, 7, 59, 60, 123, 499])
def test_synth_exif_round_trips_through_the_walk(d):
    """exif_census's synthetic writer → the real IFD walk: every typed
    field comes back as the doc_id arithmetic the oracle recomputes
    (GPS only when d%3==0, S-hemisphere sign for odd d)."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        parse_exif,
        synth_exif_tiff,
    )

    got = parse_exif(synth_exif_tiff(d))
    assert got is not None
    assert got["make"] == f"CAM{d % 5}" and got["model"] == f"M{d % 3}"
    assert got["orientation"] == 1 + d % 8
    assert got["exposure_time"] == 1.0 / (1 + d % 500)
    assert got["iso"] == 100 * (1 + d % 32)
    assert got["focal_length"] == 35 + d % 200
    if d % 3 == 0:
        want = round((d % 90) + (d % 60) / 60.0 + (d % 60) / 3600.0, 7)
        assert got["gps_lat"] == (want if d % 2 == 0 else -want)
    else:
        assert got["gps_lat"] is None


def test_parse_exif_multicount_scalars_unwrap_to_first():
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        parse_exif,
    )

    got = parse_exif(_build_exif_tiff_multicount())
    assert got is not None
    assert got["orientation"] == 6  # not [6, 1]
    assert got["exposure_time"] == 1 / 250  # not a list
    assert got["iso"] == 400


def test_extract_exif_features_survives_multicount_payload(spark):
    """One quirky payload must yield a typed row, not fail the job
    (the extractor's fail-safe-per-row contract)."""
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        extract_exif_features,
    )

    media = spark.createDataFrame(
        [
            (1, "image/tiff", bytearray(_build_exif_tiff_multicount()), "s1"),
            (2, "image/tiff", bytearray(_build_exif_tiff("<")), "s2"),
        ],
        ["item_id", "media_type", "payload", "source"],
    )
    rows = {r["item_id"]: r for r in extract_exif_features(media).collect()}
    assert rows[1]["orientation"] == 6 and rows[1]["iso"] == 400
    assert rows[1]["exposure_time"] == 1 / 250
    assert rows[2]["make"] == "Canon"


def test_extract_exif_features_typed_columns(spark):
    import struct

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        extract_exif_features,
    )

    blob = _build_exif_tiff("<")
    app1 = b"Exif\x00\x00" + blob
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe1"
        + struct.pack(">H", 2 + len(app1))
        + app1
        + b"\xff\xd9"
    )
    media = spark.createDataFrame(
        [
            (1, "image/jpeg", bytearray(jpeg), "s1"),
            (2, "text/plain", bytearray(b"hello"), "s2"),
        ],
        ["item_id", "media_type", "payload", "source"],
    )
    rows = {r["item_id"]: r for r in extract_exif_features(media).collect()}
    assert rows[1]["make"] == "Canon" and rows[1]["iso"] == 400
    assert rows[1]["gps_lon"] < 0 < rows[1]["gps_lat"]
    assert rows[2]["make"] is None and rows[2]["iso"] is None


def test_winnowing_guarantee_and_density(spark):
    """The Schleimer et al. guarantee: two docs sharing a token run of
    at least w+k−1 tokens share at least one winnowed fingerprint; two
    docs with no common k-gram share none.  Density stays near the
    theoretical 2/(w+1)."""
    from ida_ice_energy_simulation_etl_pipeline_spark.functions import word_tokens
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        winnow_fps,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k−1
    assert len(shared.split()) == WINNOW_W + WINNOW_K - 1
    docs = spark.createDataFrame(
        [
            (1, "one two three " + shared + " four five six"),
            (2, "seven eight nine ten " + shared + " eleven twelve"),
            (3, "completely different words with no overlap at all here"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: set(r["fps"])
        for r in docs.select(
            "doc_id", winnow_fps(word_tokens(F.col("text"))).alias("fps")
        ).collect()
    }
    assert rows[1] & rows[2], "shared >= w+k-1 run must share a fingerprint"
    assert not (rows[1] & rows[3]) and not (rows[2] & rows[3])
    # a doc shorter than one window yields no fingerprints
    short = spark.createDataFrame([(9, "a b c")], ["doc_id", "text"])
    [r] = short.select(
        winnow_fps(word_tokens(F.col("text"))).alias("fps")
    ).collect()
    assert r["fps"] == []


def test_tiff_lzw_and_deflate_decode_profiles():
    """TIFF LZW (MSB-first, early change, leading ClearCode) and
    Adobe-deflate strips decode to exact pixels, including the
    horizontal-differencing predictor; the encoder is an independent
    writer path (round-trip discipline), the first emitted code is
    pinned to the spec's ClearCode, and a 9→10-bit early-change
    boundary is crossed by a large buffer round-trip.  Truncated
    streams fail closed."""
    import struct
    import zlib

    from ida_ice_energy_simulation_etl_pipeline_spark.operators.multimodal import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
        decode_tiff_pixels,
    )

    # spec pin: stream begins with ClearCode(256) at 9 bits MSB-first —
    # first byte is 0b10000000
    enc = _tiff_lzw_encode(b"\x07")
    assert enc[0] == 0x80
    assert _tiff_lzw_decode(enc, 1) == b"\x07"

    # raw round-trips: repetitive (exercises table growth + KwKwK) and
    # a >1500-entry mixed buffer (crosses the 9->10 bit early change)
    rep = b"abcabcabcabc" * 40
    assert _tiff_lzw_decode(_tiff_lzw_encode(rep), len(rep)) == rep
    big = bytes((i * 37 + (i >> 3)) % 256 for i in range(6000))
    assert _tiff_lzw_decode(_tiff_lzw_encode(big), len(big)) == big
    # KwKwK: a run of one symbol forces code == len(table) on decode
    run = b"\x05" * 64
    assert _tiff_lzw_decode(_tiff_lzw_encode(run), len(run)) == run
    # truncated stream: cannot produce the expected byte count
    assert _tiff_lzw_decode(_tiff_lzw_encode(big)[:20], len(big)) is None

    def tiff(bo, entries, blob_base):
        ifd_off = 8
        out = bytearray()
        out += b"II*\x00" if bo == "<" else b"MM\x00*"
        out += struct.pack(bo + "I", ifd_off)
        out += struct.pack(bo + "H", len(entries))
        fmt = {1: "B", 3: "H", 4: "I"}
        for tag, typ, vals in entries:
            out += struct.pack(bo + "HH", tag, typ)
            out += struct.pack(bo + "I", len(vals))
            packed = struct.pack(bo + fmt[typ] * len(vals), *vals)
            out += packed + b"\x00" * (4 - len(packed))
        out += struct.pack(bo + "I", 0)
        return bytes(out)

    # LZW grayscale 4x2, one strip
    pixels = bytes([10, 20, 30, 40, 50, 60, 70, 80])
    strip = _tiff_lzw_encode(pixels)
    base = 8 + 2 + 7 * 12 + 4
    entries = [
        (256, 3, [4]), (257, 3, [2]), (258, 3, [8]),
        (259, 3, [5]), (262, 3, [1]), (273, 4, [base]),
        (279, 4, [len(strip)]),
    ]
    px = decode_tiff_pixels(tiff("<", entries, base) + strip)
    assert px.shape == (2, 4, 1)
    assert px[:, :, 0].ravel().tolist() == list(pixels)

    # LZW RGB 3x1 WITH horizontal-differencing predictor: store deltas,
    # expect absolute values back (incl. a mod-256 wrap)
    absolute = [250, 10, 0, 4, 250, 3, 30, 40, 50]  # row of 3 RGB pixels
    deltas = absolute[:3] + [
        (absolute[i] - absolute[i - 3]) % 256 for i in range(3, 9)
    ]
    strip = _tiff_lzw_encode(bytes(deltas))
    base = 8 + 2 + 9 * 12 + 4
    entries = [
        # BitsPerSample count 1 keeps the helper blob-free; the reader
        # takes spp from the explicit SamplesPerPixel tag
        (256, 3, [3]), (257, 3, [1]), (258, 3, [8]),
        (259, 3, [5]), (262, 3, [2]), (273, 4, [base]),
        (277, 3, [3]), (279, 4, [len(strip)]), (317, 3, [2]),
    ]
    px = decode_tiff_pixels(tiff("<", entries, base) + strip)
    assert px.reshape(-1).tolist() == absolute

    # deflate grayscale 4x1
    pixels = bytes([1, 2, 3, 4])
    strip = zlib.compress(pixels)
    base = 8 + 2 + 7 * 12 + 4
    entries = [
        (256, 3, [4]), (257, 3, [1]), (258, 3, [8]),
        (259, 3, [8]), (262, 3, [1]), (273, 4, [base]),
        (279, 4, [len(strip)]),
    ]
    px = decode_tiff_pixels(tiff("<", entries, base) + strip)
    assert px[:, :, 0].ravel().tolist() == [1, 2, 3, 4]

    # corrupt deflate stream fails closed
    bad = strip[:-3]
    entries[-1] = (279, 4, [len(bad)])
    assert decode_tiff_pixels(tiff("<", entries, base) + bad) is None

    # decompression-bomb shape fails closed (r12 ADVICE): a small strip
    # whose inflated size vastly exceeds the IFD geometry must be
    # rejected by the bounded inflater, not truncated after expanding —
    # 1 MiB of zeros deflates to ~1 KiB but the tile claims 4 pixels.
    bomb = zlib.compress(bytes(1 << 20))
    entries[-1] = (279, 4, [len(bomb)])
    assert decode_tiff_pixels(tiff("<", entries, base) + bomb) is None

    # padded final strip accepted (r13 review): a 4x3 gray image in
    # rows_per_strip=2 strips whose LAST strip was compressed at full
    # strip height (2 rows for 1 remaining — a real encoder pattern);
    # the bounded inflater must truncate-and-accept like the
    # PackBits/LZW paths, while the geometry clamp keeps the bomb
    # bound at min(rows_per_strip, h)·w·spp.
    px3 = bytes(range(12))
    s1 = zlib.compress(px3[:8])              # rows 0-1
    s2 = zlib.compress(px3[8:] + b"\xaa" * 4)  # row 2 + one padding row
    base2 = 8 + 2 + 8 * 12 + 4
    # SHORT-typed strip arrays (spec-legal) keep both two-value tags
    # inline — this tiff() helper has no out-of-line blob support
    entries2 = [
        (256, 3, [4]), (257, 3, [3]), (258, 3, [8]),
        (259, 3, [8]), (262, 3, [1]), (278, 3, [2]),
        (273, 3, [base2, base2 + len(s1)]),
        (279, 3, [len(s1), len(s2)]),
    ]
    px = decode_tiff_pixels(tiff("<", entries2, base2) + s1 + s2)
    assert px is not None and px[:, :, 0].ravel().tolist() == list(px3)

    # padded SINGLE strip with rows_per_strip > h accepted (r13 ADVICE:
    # cross-codec consistency): a 4x3 gray image in ONE strip declaring
    # rows_per_strip=8 and compressed at the full 8 padded rows — the
    # PackBits/LZW paths truncate-and-accept this shape, so deflate must
    # too; the bomb bound is now rows_per_strip·w·spp under the absolute
    # 4x-image sanity cap.
    s_pad = zlib.compress(px3 + b"\xbb" * (4 * 8 - 12))  # 8 rows of 4
    entries3 = [
        (256, 3, [4]), (257, 3, [3]), (258, 3, [8]),
        (259, 3, [8]), (262, 3, [1]), (278, 3, [8]),
        (273, 4, [8 + 2 + 8 * 12 + 4]),
        (279, 4, [len(s_pad)]),
    ]
    px = decode_tiff_pixels(tiff("<", entries3, 8 + 2 + 8 * 12 + 4) + s_pad)
    assert px is not None and px[:, :, 0].ravel().tolist() == list(px3)

    # ...but the absolute cap still rejects a bomb hiding behind a huge
    # declared rows_per_strip: same 4x3 geometry, rows_per_strip=65535,
    # strip inflating to 1 MiB.
    bomb2 = zlib.compress(bytes(1 << 20))
    entries4 = [
        (256, 3, [4]), (257, 3, [3]), (258, 3, [8]),
        (259, 3, [8]), (262, 3, [1]), (278, 3, [65535]),
        (273, 4, [8 + 2 + 8 * 12 + 4]),
        (279, 4, [len(bomb2)]),
    ]
    assert decode_tiff_pixels(tiff("<", entries4, 8 + 2 + 8 * 12 + 4) + bomb2) is None
