"""Brute-force recall differentials for the banding claims (VERDICT r4
#4): the pigeonhole argument (hamming<=3 => >=1 shared 16-bit band) and
the multi-band LSH recall contract are pinned by TEST against all-pairs
Python computations, not prose.

Reference behavior: gjtorikian/selma has no near-dup ops; these pin the
pipeline-added scale operators' own documented contracts
(textops.simhash_near_dup, textops.near_dup_verified docstrings).
"""

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import SparkSession

from selma_spark.spark import textops
from selma_spark.spark.textops import MINHASH_SALTS


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("selma-recall-differential")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = docs.select("doc_id", "text").collect()
    return {int(r["doc_id"]): r["text"] for r in rows}


# --- pure-Python twins of the Spark expressions -----------------------------

def _py_simhash(text: str) -> int:
    """Unsigned 64-bit twin of _SIMHASH64_EXPR: bit j is the majority
    vote of bit (j % 4) of hex digit (j // 4 + 1) of md5(token)."""
    toks = text.split(" ")
    counts = [0] * 64
    for t in toks:
        h = hashlib.md5(t.encode("utf-8")).hexdigest()
        for j in range(64):
            counts[j] += (int(h[j // 4], 16) >> (j % 4)) & 1
    sig = 0
    for j in range(64):
        if 2 * counts[j] > len(toks):
            sig |= 1 << j
    return sig


def _py_shingles(text: str) -> frozenset:
    toks = text.split(" ")
    if len(toks) >= 3:
        return frozenset(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )
    return frozenset({" ".join(toks)})


def _py_minhash(shingles: frozenset) -> tuple:
    return tuple(
        min(
            hashlib.md5((salt + s).encode("utf-8")).hexdigest()
            for s in shingles
        )
        for salt in MINHASH_SALTS
    )


def _round_half_up_4(num: int, den: int) -> Decimal:
    """Spark's round() is HALF_UP; Python's round() is banker's — use
    Decimal so borderline Jaccards can't diverge between the twins."""
    return (Decimal(num) / Decimal(den)).quantize(
        Decimal("0.0001"), rounding=ROUND_HALF_UP
    )


# --- simhash: band join returns EXACTLY the hamming<=3 pairs ----------------

def test_simhash_near_dup_equals_brute_force_hamming(spark, corpus):
    """All-pairs brute force: simhash_near_dup must return EXACTLY the
    pairs within hamming 3 whose shared band survives the bucket cap —
    and on this corpus the cap drops nothing, so the result IS the full
    hamming<=3 pair set (the pigeonhole claim, pinned end-to-end)."""
    sigs = {d: _py_simhash(t) for d, t in corpus.items()}

    # kept (band_id, band_val) buckets under the cap
    occupancy: dict[tuple, int] = {}
    for sig in sigs.values():
        for k in range(4):
            key = (k, (sig >> (16 * k)) & 0xFFFF)
            occupancy[key] = occupancy.get(key, 0) + 1
    kept = {key for key, n in occupancy.items() if n <= 100}

    brute = set()
    brute_with_kept_band = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if (sigs[a] ^ sigs[b]).bit_count() <= 3:
                brute.add((a, b))
                if any(
                    (k, (sigs[a] >> (16 * k)) & 0xFFFF) in kept
                    and ((sigs[a] >> (16 * k)) & 0xFFFF)
                    == ((sigs[b] >> (16 * k)) & 0xFFFF)
                    for k in range(4)
                ):
                    brute_with_kept_band.add((a, b))

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        (int(r["doc_a"]), int(r["doc_b"]))
        for r in textops.simhash_near_dup(docs).collect()
    }
    assert got == brute_with_kept_band
    # cap-dropped pairs asserted separately: on this corpus no hamming<=3
    # pair loses its only shared band to the cap, so the join is EXACT
    assert brute_with_kept_band == brute
    assert got, "vacuous corpus: no hamming<=3 pairs to differentiate"


def test_simhash_cap_drop_is_exact_dup_territory(spark):
    """A 150-identical-doc mega-cluster saturates every band bucket
    (> max_band_size=100), so simhash_near_dup reports NO pairs for it —
    and brute force confirms every dropped pair is hamming 0, i.e.
    exact-dup territory (the documented cap contract)."""
    n = 150
    rows = [(i, "the same exact boilerplate text repeated verbatim")
            for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = textops.simhash_near_dup(docs).collect()
    assert got == []
    sigs = {d: _py_simhash(t) for d, t in rows}
    dropped = [
        (a, b)
        for i, a in enumerate(sorted(sigs))
        for b in sorted(sigs)[i + 1 :]
        if (sigs[a] ^ sigs[b]).bit_count() <= 3
    ]
    assert len(dropped) == n * (n - 1) // 2
    assert all((sigs[a] ^ sigs[b]).bit_count() == 0 for a, b in dropped)


def test_pigeonhole_shared_band_property(corpus):
    """The pure pigeonhole invariant on real signatures: every pair
    within hamming 3 agrees exactly on >= 1 of the 4 16-bit bands."""
    sigs = [_py_simhash(t) for t in corpus.values()]
    checked = 0
    for i, a in enumerate(sigs):
        for b in sigs[i + 1 :]:
            if (a ^ b).bit_count() <= 3:
                checked += 1
                assert any(
                    ((a >> (16 * k)) & 0xFFFF) == ((b >> (16 * k)) & 0xFFFF)
                    for k in range(4)
                )
    assert checked > 0


def _py_simhash128(text: str) -> tuple:
    toks = text.split(" ")
    counts = [0] * 128
    for t in toks:
        h = hashlib.md5(t.encode("utf-8")).hexdigest()
        for j in range(128):
            counts[j] += (int(h[j // 4], 16) >> (j % 4)) & 1
    hi = lo = 0
    for j in range(64):
        if 2 * counts[j] > len(toks):
            hi |= 1 << j
        if 2 * counts[64 + j] > len(toks):
            lo |= 1 << j
    return hi, lo


def test_simhash128_near_dup_equals_brute_force(spark, corpus):
    """128-bit variant (r5, the band-saturation scale path): output must
    equal the all-pairs 128-bit hamming<=3 set modulo kept 32-bit bands,
    and sim_hi must equal the 64-bit signature bit-for-bit."""
    from selma_spark.spark import textops as T

    sigs = {d: _py_simhash128(t) for d, t in corpus.items()}
    occupancy: dict[tuple, int] = {}
    for hi, lo in sigs.values():
        for k in range(4):
            w = hi if k < 2 else lo
            key = (k, (w >> (32 * (k % 2))) & 0xFFFFFFFF)
            occupancy[key] = occupancy.get(key, 0) + 1
    kept = {key for key, n in occupancy.items() if n <= 100}

    def bands_of(hi, lo):
        for k in range(4):
            w = hi if k < 2 else lo
            yield (k, (w >> (32 * (k % 2))) & 0xFFFFFFFF)

    expected = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ha, la = sigs[a]
            hb, lb = sigs[b]
            if ((ha ^ hb).bit_count() + (la ^ lb).bit_count()) > 3:
                continue
            if any(
                ka == kb and ka in kept
                for ka, kb in zip(bands_of(ha, la), bands_of(hb, lb))
            ):
                expected.add((a, b))

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        (int(r["doc_a"]), int(r["doc_b"]))
        for r in T.simhash_near_dup128(docs).collect()
    }
    assert got == expected
    assert got, "vacuous corpus"
    # hi word is bit-for-bit the 64-bit signature
    s64 = {
        int(r["doc_id"]): int(r["simhash"])
        for r in T.simhash64(docs).collect()
    }
    for r in T.simhash128(docs).collect():
        assert int(r["sim_hi"]) == s64[int(r["doc_id"])]


# --- clustering: star contraction vs brute-force components -----------------

def test_near_dup_clusters_matches_brute_components_on_chain_graph(spark):
    """Adversarial long-chain candidate graph (sliding 21-token windows
    over one token stream, doc_ids scrambled): the r5 soak showed plain
    min-label propagation needs O(diameter) rounds on exactly this
    shape, which is why near_dup_clusters now runs alternating
    large-star/small-star (O(log^2 n) rounds). This pins (a) convergence
    within the default 20-round budget on a deep chain and (b) cluster
    labels == brute-force connected components of the ACTUAL candidate
    pair graph, computed in Python."""
    from selma_spark.spark import textops as T

    stream = [f"w{j}" for j in range(120)]
    rows = [(i, " ".join(stream[i : i + 21])) for i in range(100)]
    # 37 is coprime to 100 -> a deterministic id scramble, so the min id
    # lands mid-chain and label placement is adversarial
    docs_rows = [((i * 37) % 100, txt) for i, (_, txt) in enumerate(rows)]
    docs = spark.createDataFrame(docs_rows, "doc_id bigint, text string")

    pairs = [
        (int(r["doc_a"]), int(r["doc_b"]))
        for r in T.near_dup_pairs(docs).collect()
    ]
    adj: dict[int, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # brute components + diameter of the largest (the chain must be deep
    # enough that an O(diameter) algorithm would be stressed)
    seen: set = set()
    comps = []
    for v in adj:
        if v in seen:
            continue
        stack, comp = [v], []
        seen.add(v)
        while stack:
            u = stack.pop()
            comp.append(u)
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        comps.append(comp)
    big = max(comps, key=len)

    def _far(s):
        dist = {s: 0}
        order = [s]
        for u in order:
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    order.append(w)
        far = max(dist, key=dist.get)
        return far, dist[far]

    f1, _ = _far(big[0])
    _, diameter = _far(f1)
    assert len(big) >= 50 and diameter >= 10, (len(big), diameter)

    expected = {}
    for comp in comps:
        mn = min(comp)
        for u in comp:
            expected[u] = mn
    got = {
        int(r["doc_id"]): int(r["cluster_id"])
        for r in T.near_dup_clusters(docs).collect()
    }
    assert got == expected


# --- LSH + exact verify: recall vs brute-force Jaccard ----------------------

def test_near_dup_verified_equals_brute_force_jaccard(spark, corpus):
    """All-pairs brute force: near_dup_verified must return EXACTLY the
    pairs with rounded Jaccard >= t that share >= 1 kept minhash band —
    i.e. the LSH candidate stage loses nothing the banding scheme
    promises, the cap's drops are accounted for, and the exact-verify
    stage (with its size-ratio prefilter) filters to true Jaccard."""
    t = Decimal("0.5")
    shingles = {d: _py_shingles(txt) for d, txt in corpus.items()}
    mh = {d: _py_minhash(s) for d, s in shingles.items()}

    occupancy: dict[tuple, int] = {}
    for sig in mh.values():
        for band_id, val in enumerate(sig):
            key = (band_id, val)
            occupancy[key] = occupancy.get(key, 0) + 1
    kept = {key for key, n in occupancy.items() if n <= 50}

    expected = set()
    candidates = 0
    ids = sorted(shingles)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shares_kept = any(
                mh[a][k] == mh[b][k] and (k, mh[a][k]) in kept
                for k in range(4)
            )
            if not shares_kept:
                continue
            candidates += 1
            inter = len(shingles[a] & shingles[b])
            union = len(shingles[a] | shingles[b])
            if _round_half_up_4(inter, union) >= t:
                expected.add((a, b))

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        (int(r["doc_a"]), int(r["doc_b"]))
        for r in textops.near_dup_verified(docs, threshold=0.5).collect()
    }
    assert got == expected
    assert got, "vacuous corpus: no J>=0.5 banded pairs to differentiate"
    # the candidate stage really is doing work: brute-force candidates
    # far exceed survivors, else the verify stage is vacuous here
    assert candidates > len(expected)
