"""Deterministic Common-Crawl-style `pages` corpus with golden triples.

Synthesizes the input table mandated by BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Design (FIXTURES.md §1):
  - Sentences follow closed SVO templates over a fixed entity/alias dictionary,
    so the rule-based extractor (kgspark.openie) has KNOWN golden concepts and
    the edge generator's output can be scored for P/R against golden triples.
  - Domains are drawn from a Zipf-ish distribution — a few hot domains dominate,
    exercising salting / AQE skew handling.
  - `html` wraps `text` in boilerplate plus noise (newline/tab runs, &nbsp;,
    control chars, multi-space runs, CJK/accented words) chosen to exercise the
    byte-identity cases of the reference cleaners
    (ref /root/reference/knowledgeGraph.py:14-20, json_validator.py:92-111).
  - Everything is seeded; NO external data.
"""

from __future__ import annotations

import datetime as _dt
import random
from typing import Any

# ---------------------------------------------------------------------------
# Closed entity/alias dictionary. Canonical name -> aliases (surface forms the
# linker must resolve). Mix of multi-word, unicode, and plain names.
# ---------------------------------------------------------------------------
ENTITY_ALIASES: dict[str, list[str]] = {
    "United States": ["USA", "America"],
    "New York": ["NYC"],
    "Acme Corp": ["Acme", "Acme Corporation"],
    "Globex": ["Globex Inc"],
    "Alice Johnson": ["Alice"],
    "Bob Smith": ["Bob"],
    "Apache Spark": ["Spark"],
    "PostgreSQL": ["Postgres"],
    "Machine Learning": ["ML"],
    "Neural Network": ["NeuralNet"],
    "Knowledge Graph": ["KG"],
    "Data Pipeline": [],
    "Cloud Computing": [],
    "Beijing": ["北京"],
    "Café Olé": [],
    "Naïve Bayes": [],
    "Quantum Computer": [],
    "Solar Panel": [],
    "Electric Car": ["EV"],
    "Wind Turbine": [],
    "Search Engine": [],
    "Web Crawler": ["Crawler"],
    "Database Index": [],
    "Hash Table": [],
    "Merge Sort": [],
    "Binary Tree": [],
    "Distributed System": [],
    "Message Queue": ["MQ"],
    "Load Balancer": [],
    "Great Wall": [],
}

TYPE_NOUNS = [
    "company", "person", "city", "country", "algorithm", "technology",
    "database", "framework", "vehicle", "device", "structure", "system",
]
ADJECTIVES = [
    "fast", "reliable", "popular", "scalable", "efficient", "durable",
    "innovative", "complex", "lightweight", "robust",
]
VERBS = [
    "process data", "store records", "serve queries", "learn patterns",
    "generate power", "route traffic", "index documents", "sort keys",
]
FILLERS = [
    "The weather report mentioned light rain near the coast.",
    "Several visitors arrived early in the morning.",
    "Nothing unusual happened during the long afternoon.",
    "Many small details were recorded in the old ledger.",
    "A quiet street ran beside the narrow river.",
]

N_DOMAINS = 50


def canonical_entities() -> list[str]:
    return sorted(ENTITY_ALIASES)


def alias_rows() -> list[tuple[str, str, float]]:
    """(alias_surface, canonical, score) rows for the broadcast alias table.

    Canonical self-mapping gets score 1.0; aliases get 0.9 (candidate scoring:
    highest score wins when a surface form maps to several candidates).
    """
    rows: list[tuple[str, str, float]] = []
    for canon in canonical_entities():
        rows.append((canon.lower(), canon, 1.0))
        for a in ENTITY_ALIASES[canon]:
            rows.append((a.lower(), canon, 0.9))
    return rows


# ---------------------------------------------------------------------------
# Sentence templates. Each template both renders text and records the golden
# relation it encodes (on canonical names).
# ---------------------------------------------------------------------------

def _surface(rng: random.Random, canon: str) -> str:
    """Render a canonical entity as itself or one of its aliases."""
    forms = [canon] + ENTITY_ALIASES[canon]
    return forms[rng.randrange(len(forms))]


def generate_page_content(rng: random.Random) -> tuple[str, dict[str, dict[str, Any]]]:
    """One page's sentences + golden concept dict (canonical-name keyed).

    Golden concept schema mirrors the reference extractor output
    (ref /root/reference/knowledge_graph_builder.py:209-222):
      {name, type, parents[], children[], related[], properties[], actions[]}
    """
    ents = canonical_entities()
    k = rng.randint(2, 4)
    chosen = rng.sample(ents, k)
    concepts: dict[str, dict[str, Any]] = {}

    def concept(name: str) -> dict[str, Any]:
        return concepts.setdefault(
            name,
            {"name": name, "type": "concept", "parents": [], "children": [],
             "related": [], "properties": [], "actions": []},
        )

    sentences: list[str] = []
    for name in chosen:
        c = concept(name)
        n_facts = rng.randint(2, 4)
        for _ in range(n_facts):
            kind = rng.randrange(5)
            if kind == 0:  # is_a -> parent + concept type
                t = TYPE_NOUNS[rng.randrange(len(TYPE_NOUNS))]
                art = "an" if t[0] in "aeiou" else "a"
                sentences.append(f"{_surface(rng, name)} is {art} {t}.")
                if t not in c["parents"]:
                    c["parents"].append(t)
            elif kind == 1:  # has -> child
                other = chosen[rng.randrange(k)]
                if other != name:
                    sentences.append(f"{_surface(rng, name)} has {_surface(rng, other)}.")
                    if other not in c["children"]:
                        c["children"].append(other)
            elif kind == 2:  # related_to
                other = chosen[rng.randrange(k)]
                if other != name:
                    sentences.append(
                        f"{_surface(rng, name)} is related to {_surface(rng, other)}."
                    )
                    if other not in c["related"]:
                        c["related"].append(other)
            elif kind == 3:  # property
                adj = ADJECTIVES[rng.randrange(len(ADJECTIVES))]
                sentences.append(f"{_surface(rng, name)} is {adj}.")
                if adj not in c["properties"]:
                    c["properties"].append(adj)
            else:  # action
                v = VERBS[rng.randrange(len(VERBS))]
                sentences.append(f"{_surface(rng, name)} can {v}.")
                if v not in c["actions"]:
                    c["actions"].append(v)
        if rng.random() < 0.4:
            sentences.append(FILLERS[rng.randrange(len(FILLERS))])

    rng.shuffle(sentences)
    text = " ".join(sentences)
    # Drop concepts that ended up with zero facts (all rolls self-referenced).
    concepts = {n: c for n, c in concepts.items()
                if c["parents"] or c["children"] or c["related"]
                or c["properties"] or c["actions"]}
    for c in concepts.values():
        n_rel = len(c["parents"]) + len(c["children"]) + len(c["related"])
        c["importance"] = round(0.5 + 0.1 * min(n_rel, 5), 1)
        # Order-independent concept type: first parent alphabetically (the
        # sentence shuffle must not change it).
        c["type"] = sorted(c["parents"])[0] if c["parents"] else "concept"
    return text, concepts


# Noise separators: after tag-strip + entity-decode + clean_text +
# control-char strip (that order — ref knowledgeGraph.py:43-46 then
# json_validator.py:92-111) every one of these must collapse to ONE space.
# Control chars are attached to one side only: clean_text collapses the
# whitespace runs first, the later ctrl-strip then deletes the char without
# leaving a double space.
_NOISE_SEPS = [
    " ", "\n\n\t ", " &nbsp; ", "  \r\n ", " \x0b ", "\t\t", "\x00 ",
    "\x01\x02 ", "   ", " &#32; ",
]


def render_html(rng: random.Random, text: str, url: str) -> bytes:
    """Wrap text in boilerplate HTML + whitespace/control/entity noise such
    that kgspark.html.extract_text(html) == text, byte-identically."""
    words = text.split(" ")
    noisy = words[0] if words else ""
    for w in words[1:]:
        sep = _NOISE_SEPS[rng.randrange(len(_NOISE_SEPS))] if rng.random() < 0.3 else " "
        noisy += sep + w
    # Paragraph breaks: block tags become whitespace then collapse.
    body = noisy.replace(". ", ".</p>\n<p>", 1) if ". " in noisy else noisy
    html = (
        "<!DOCTYPE html>\n<html><head><title>doc</title>"
        "<style>p { color: #333; }</style>"
        "<script>var tracker = 'ignore me';</script></head>\n"
        f"<body><!-- crawl of {url} -->\n<nav></nav>\n<p>{body}</p>\n"
        "<script>console.log('footer');</script></body></html>"
    )
    return html.encode("utf-8")


DOMAIN_WEIGHTS = [1.0 / (i + 1) for i in range(N_DOMAINS)]  # Zipf s=1


def generate_pages(
    n: int, seed: int = 42
) -> tuple[list[dict[str, Any]], dict[str, dict[str, dict[str, Any]]]]:
    """n seeded pages + golden concepts per url."""
    rng = random.Random(seed)
    base_ts = _dt.datetime(2024, 3, 1, tzinfo=_dt.timezone.utc)
    rows: list[dict[str, Any]] = []
    golden: dict[str, dict[str, dict[str, Any]]] = {}
    langs = ["en"] * 8 + ["de", "es"]
    for i in range(n):
        text, concepts = generate_page_content(rng)
        domain_idx = rng.choices(range(N_DOMAINS), weights=DOMAIN_WEIGHTS)[0]
        url = f"https://site{domain_idx}.example.com/page/{i}"
        rows.append(
            {
                "url": url,
                "warc_ts": base_ts + _dt.timedelta(seconds=17 * i),
                "html": render_html(rng, text, url),
                "text": text,
                "lang": langs[rng.randrange(len(langs))],
            }
        )
        golden[url] = concepts
    return rows, golden


def golden_triples(golden: dict[str, dict[str, dict[str, Any]]]) -> set[tuple[str, str, str]]:
    """Distinct (subj, pred, obj) the edge generator must emit — reference
    fwd+rev semantics (ref knowledge_graph_builder.py:527-563, reverse map
    :548-552) applied to golden concepts on canonical names."""
    out: set[tuple[str, str, str]] = set()
    reverse = {"is_a": "has_instance", "has": "belongs_to", "related_to": "related_to"}
    for concepts in golden.values():
        for c in concepts.values():
            for rel, targets in (
                ("is_a", c["parents"]),
                ("has", c["children"]),
                ("related_to", c["related"]),
            ):
                for t in targets:
                    out.add((c["name"], rel, t))
                    out.add((t, reverse[rel], c["name"]))
    return out


def pages_df(spark, n: int, seed: int = 42):
    """Pages as a Spark DataFrame with the input_hint schema."""
    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType, TimestampType,
    )

    rows, _ = generate_pages(n, seed)
    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    data = [(r["url"], r["warc_ts"].replace(tzinfo=None), r["html"], r["text"], r["lang"]) for r in rows]
    return spark.createDataFrame(data, schema)


def write_pages_parquet(path: str, n: int, seed: int = 42) -> None:
    """Write pages to parquet driver-free (pyarrow) — used by bench setup."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows, _ = generate_pages(n, seed)
    table = pa.table(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array([r["warc_ts"].replace(tzinfo=None) for r in rows],
                                 type=pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], type=pa.binary()),
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        }
    )
    pq.write_table(table, path)
