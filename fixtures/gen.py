"""Deterministic page-corpus + golden dup-pair fixture generator.

Implements FIXTURES.md F1/F2/F4: a Common-Crawl-shaped `pages` table
(url, warc_ts, html, text, lang — the BASELINE.json input_hint schema)
with planted near-duplicates, one reference error class per planted
copy (classes cite /root/reference/src/uFuzzy.mjs semantics they
exercise). The vocabulary mirrors the 9 corpus list shapes of the
reference's stripped test corpus (demos/compare.html:1492-1502).

`is_dup` labels are computed by the SAME PairVerifier the Spark
verify UDF uses — the pipeline recall metric is therefore measured
against reference-semantics ground truth, and what it tests is the
candidate-generation (LSH) + clustering recall.

Pure Python/NumPy — no Spark — so the oracle and the pipeline consume
byte-identical fixtures. Seeded (default 42).
"""

from __future__ import annotations

import argparse
import datetime as dt
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ufuzzy_spark.config import PipelineConfig
from ufuzzy_spark.latinize import ACCENT_DST, ACCENT_SRC
from ufuzzy_spark.pairdup import PairVerifier, normalize_text

# -- vocabulary: mirrors the reference corpus categories -------------- #

_METRIC_STEMS = (
    "http_requests_total node_cpu_seconds process_resident_memory "
    "go_goroutines jvm_gc_pause scrape_duration api_latency_p99 "
    "disk_io_bytes net_rx_packets cache_hit_ratio queue_depth "
    "replication_lag shard_rebalance compaction_time wal_fsync"
).split()

_GAME_WORDS = (
    "Dragon Mage Fireball Frostbolt Paladin Warlock Murloc Raid "
    "Dungeon Quest Legendary Portal Shadow Priest Totem Beast "
    "Arcane Rogue Champion Siege Nether Titan Goblin Gnome"
).split()

_FILE_DIRS = "Engine Source Content Plugins Binaries Config Shaders".split()
_FILE_NAMES = (
    "ActorComponent SceneRenderer MaterialInstance BlueprintCore "
    "PhysicsVolume NavMeshBounds LightmassImportance SkeletalMesh"
).split()

_TITLE_WORDS = (
    "super awesome ultimate complete definitive enhanced deluxe "
    "remastered championship galactic quantum stellar mighty tiny "
    "brave lost forgotten eternal crimson emerald"
).split()

_PLAIN_WORDS = (
    "the quick brown fox jumps over lazy dog while seventeen "
    "wizards brew potent elixirs under moonlight and ancient oaks "
    "whisper secrets about forgotten kingdoms beyond misty rivers "
    "where travelers trade stories with keepers of luminous maps "
    "players guide handbook chapter section appendix glossary "
    "introduction summary conclusion analysis methodology results"
).split()

_ACCENT_WORDS = "café naïve résumé jalapeño über señor château crème".split()
_CONTRACTIONS = "player's dragon's keeper's world's".split()

_DOMAINS = [f"site{i:02d}.example.com" for i in range(50)]


def _make_phrase(rng: random.Random) -> str:
    cat = rng.randrange(8)
    if cat == 0:  # metric_name-like (underscores, digit runs)
        return f"{rng.choice(_METRIC_STEMS)}_{rng.randrange(10)}{{shard=\"{rng.randrange(100)}\"}}"
    if cat == 1:  # hearthstone/mtg-like card titles
        return f"{rng.choice(_GAME_WORDS)} {rng.choice(_GAME_WORDS)} {rng.randrange(1, 13)}"
    if cat == 2:  # ue4-like file paths (camelCase + slashes)
        return f"/{rng.choice(_FILE_DIRS)}/{rng.choice(_FILE_NAMES)}{rng.randrange(100)}.uasset"
    if cat == 3:  # steam-like game titles (digits, colons)
        return (
            f"{rng.choice(_TITLE_WORDS).title()} "
            f"{rng.choice(_GAME_WORDS)} {rng.choice(['II', 'III', '2023', 'HD'])}"
        )
    if cat == 4:  # urls_and_titles-like
        return f"www.{rng.choice(_PLAIN_WORDS)}{rng.randrange(100)}.org {rng.choice(_TITLE_WORDS)}"
    if cat == 5:  # accents + contractions (latinize / intraContr paths)
        return f"{rng.choice(_ACCENT_WORDS)} {rng.choice(_CONTRACTIONS)} {rng.choice(_PLAIN_WORDS)}"
    if cat == 6:  # camelCase identifiers (intraSplit/boundary paths)
        return (
            rng.choice(_FILE_NAMES)
            + rng.choice(_TITLE_WORDS).title()
            + str(rng.randrange(10))
        )
    return " ".join(rng.choice(_PLAIN_WORDS) for _ in range(rng.randrange(3, 7)))


def make_doc(rng: random.Random, min_words: int = 20, max_words: int = 120) -> str:
    """Compose a document from phrase templates (FIXTURES.md F1)."""
    target = rng.randrange(min_words, max_words)
    words = 0
    phrases = []
    while words < target:
        p = _make_phrase(rng)
        phrases.append(p)
        words += len(p.split())
    return " ".join(phrases)


def make_digit_doc(rng: random.Random) -> str:
    """Digit-heavy doc for the digit_run negative-control class
    (digits must match exactly: uFuzzy.mjs:185,275-276)."""
    parts = []
    for _ in range(rng.randrange(15, 30)):
        if rng.random() < 0.5:
            parts.append(str(rng.randrange(10_000, 99_999_999)))
        else:
            parts.append(rng.choice(_PLAIN_WORDS))
    return " ".join(parts)


# -- mutation classes (FIXTURES.md F2) -------------------------------- #

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _edit_word(rng: random.Random, w: str, op: str) -> str:
    """One edit inside a word, never at char 0 (intraSlice=[1,inf]
    requires exact first char, uFuzzy.mjs:58,290-294)."""
    if len(w) < 3:
        return w
    i = rng.randrange(1, len(w) - 1)
    if op == "ins":
        return w[:i] + rng.choice(_ALPHA) + w[i:]
    if op == "sub":
        c = rng.choice([x for x in _ALPHA if x != w[i].lower()])
        return w[:i] + c + w[i + 1:]
    if op == "del":
        return w[:i] + w[i + 1:]
    # trn — need differing neighbors
    if w[i] != w[i + 1]:
        return w[:i] + w[i + 1] + w[i] + w[i + 2:]
    return w


def _mutable_idx(words: list[str], min_len: int = 5) -> list[int]:
    return [
        i for i, w in enumerate(words)
        if len(w) >= min_len and w.isalpha()
    ]


_ACCENT_FWD = {}  # base char -> one accented variant
for src_c, dst_c in zip(ACCENT_SRC, ACCENT_DST):
    _ACCENT_FWD.setdefault(dst_c, src_c)


def mutate(rng: random.Random, text: str, cls: str) -> str:
    """Apply exactly one mutation class from the reference error model."""
    words = text.split(" ")

    if cls == "exact":
        return text

    if cls in ("ins1", "sub1", "trn1", "del1"):
        op = cls[:3]
        idx = _mutable_idx(words)
        rng.shuffle(idx)
        for i in idx[: max(1, len(idx) // 10)]:  # ~10% of long words, 1 edit each
            words[i] = _edit_word(rng, words[i], op)
        return " ".join(words)

    if cls == "short_term":
        # 3-4 char words: ladder allows exactly 1 transposition
        idx = [i for i, w in enumerate(words) if 3 <= len(w) <= 4 and w.isalpha()]
        rng.shuffle(idx)
        for i in idx[: max(1, len(idx) // 3)]:
            words[i] = _edit_word(rng, words[i], "trn")
        return " ".join(words)

    if cls == "digit_run":
        # corrupt every digit run -> digit terms must fail (exact-only)
        out = []
        for w in words:
            if w.isdigit():
                j = rng.randrange(len(w))
                out.append(w[:j] + str((int(w[j]) + 1) % 10) + w[j + 1:])
            else:
                out.append(w)
        return " ".join(out)

    if cls == "ooo":
        # order permutation: set-similarity preserved (uFuzzy.mjs:812-858)
        rng.shuffle(words)
        return " ".join(words)

    if cls == "case":
        return " ".join(
            w.upper() if rng.random() < 0.3 else w.title() if rng.random() < 0.3 else w
            for w in words
        )

    if cls == "diacritic":
        out = []
        for w in words:
            if rng.random() < 0.4:
                w = "".join(_ACCENT_FWD.get(c, c) if rng.random() < 0.5 else c for c in w)
            out.append(w)
        return " ".join(out)

    if cls == "boundary":
        # re-segment: spaces -> underscores / camel joins (interLft/Rgt rules)
        out = []
        i = 0
        while i < len(words):
            if rng.random() < 0.25 and i + 1 < len(words):
                joiner = rng.choice(["_", ""])
                w2 = words[i + 1].title() if joiner == "" else words[i + 1]
                out.append(words[i] + joiner + w2)
                i += 2
            else:
                out.append(words[i])
                i += 1
        return " ".join(out)

    if cls == "near_miss":
        # 2-3 edits per word on ~40% of words -> must NOT verify
        idx = _mutable_idx(words, min_len=4)
        rng.shuffle(idx)
        for i in idx[: max(2, int(len(idx) * 0.6))]:
            w = words[i]
            for _ in range(3):
                w = _edit_word(rng, w, rng.choice(["ins", "sub", "del"]))
            words[i] = w
        return " ".join(words)

    raise ValueError(f"unknown mutation class {cls}")


DUP_CLASSES = [
    "exact", "ins1", "sub1", "trn1", "del1", "short_term",
    "ooo", "case", "diacritic", "boundary",
]
NEG_CLASSES = ["digit_run", "near_miss"]


# -- corpus assembly --------------------------------------------------- #

def char_shingles(s: str, k: int) -> set:
    return {s[i: i + k] for i in range(max(1, len(s) - k + 1))}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def gen_corpus(
    n_rows: int,
    seed: int = 42,
    dup_frac: float = 0.3,
    pcfg: PipelineConfig | None = None,
    label_pairs: bool = True,
):
    """Returns (pages, pairs).

    pages: list of dict(url, warc_ts, html, text, lang)
    pairs: list of dict(url_a, url_b, is_dup, mutation, sim_jaccard)
    """
    pcfg = pcfg or PipelineConfig()
    rng = random.Random(seed)
    verifier = PairVerifier(pcfg) if label_pairs else None

    n_dups = int(n_rows * dup_frac)
    n_base = n_rows - n_dups

    pages = []
    t0 = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

    def add_page(i: int, text: str, lang: str):
        # Zipf-ish domain skew drives partition/bucket skew (FIXTURES.md F1)
        dom = _DOMAINS[min(int(rng.paretovariate(1.2)) - 1, len(_DOMAINS) - 1)]
        url = f"https://{dom}/{lang}/doc-{i:07d}"
        pages.append(
            {
                "url": url,
                "warc_ts": t0 + dt.timedelta(seconds=7 * i),
                "html": b"<html><body>" + text.encode("utf-8") + b"</body></html>",
                "text": text,
                "lang": lang,
            }
        )
        return url

    base_urls = []
    base_texts = []
    for i in range(n_base):
        lang = "xx" if rng.random() < 0.05 else "en"
        # a slice of digit-heavy docs hosts the digit_run negative class
        text = make_digit_doc(rng) if rng.random() < 0.06 else make_doc(rng)
        url = add_page(i, text, lang)
        if lang == "en":
            base_urls.append(url)
            base_texts.append(text)

    pairs = []
    all_classes = DUP_CLASSES + NEG_CLASSES
    for j in range(n_dups):
        bi = rng.randrange(len(base_urls))
        src_text = base_texts[bi]
        if src_text.split(" ") and sum(w.isdigit() for w in src_text.split(" ")) > 5:
            cls = "digit_run" if rng.random() < 0.7 else "exact"
        else:
            cls = rng.choice([c for c in all_classes if c != "digit_run"])
        mut_text = mutate(rng, src_text, cls)
        url = add_page(n_base + j, mut_text, "en")

        na, nb = normalize_text(src_text), normalize_text(mut_text)
        if verifier is not None:
            feats = verifier.verify(na, nb)
            is_dup = feats.is_dup
        else:
            is_dup = cls in DUP_CLASSES
        a, b = sorted((base_urls[bi], url))
        pairs.append(
            {
                "url_a": a,
                "url_b": b,
                "is_dup": is_dup,
                "mutation": cls,
                "sim_jaccard": jaccard(
                    char_shingles(na, pcfg.shingle_k),
                    char_shingles(nb, pcfg.shingle_k),
                ),
            }
        )

    # a few sampled unrelated negatives (mutation='none')
    for _ in range(max(10, n_dups // 10)):
        i, j = rng.randrange(len(base_urls)), rng.randrange(len(base_urls))
        if i == j:
            continue
        a, b = sorted((base_urls[i], base_urls[j]))
        na, nb = normalize_text(base_texts[i]), normalize_text(base_texts[j])
        is_dup = verifier.verify(na, nb).is_dup if verifier else False
        pairs.append(
            {
                "url_a": a,
                "url_b": b,
                "is_dup": is_dup,
                "mutation": "none",
                "sim_jaccard": jaccard(
                    char_shingles(na, pcfg.shingle_k),
                    char_shingles(nb, pcfg.shingle_k),
                ),
            }
        )

    return pages, pairs


def write_fixtures(outdir: str | Path, n_rows: int, seed: int = 42, **kw):
    import pyarrow as pa
    import pyarrow.parquet as pq

    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    pages, pairs = gen_corpus(n_rows, seed, **kw)

    pages_tbl = pa.Table.from_pylist(
        pages,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us", tz="UTC")),
                ("html", pa.binary()),
                ("text", pa.string()),
                ("lang", pa.string()),
            ]
        ),
    )
    # multiple row groups -> splittable scans (parquet parallelism is
    # row-group granular; a single giant row group serializes Spark)
    pq.write_table(pages_tbl, outdir / "pages.parquet", row_group_size=4096)
    pq.write_table(pa.Table.from_pylist(pairs), outdir / "dup_pairs_oracle.parquet")
    return outdir


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default="/tmp/ufz_fixtures")
    ap.add_argument("--no-labels", action="store_true")
    args = ap.parse_args()
    out = write_fixtures(
        args.out, args.rows, args.seed, label_pairs=not args.no_labels
    )
    print(f"wrote fixtures to {out}")
