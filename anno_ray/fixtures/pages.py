"""Deterministic synthetic Common-Crawl-style page generator.

Produces the input table of the north rule's input_hint shape:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

Every page is generated from ``seed`` + page index only, so any shard range
can be regenerated independently (resume / distributed generation friendly).
Bodies are entity-rich template sentences exercising RegexNER types,
HeuristicNER rules, negation, ACE event triggers and relation keywords;
the HTML wrapper exercises the extractor branches (script/style bodies with
fake tags, named/numeric/unknown/unterminated entities, block-vs-inline
spacing, attributes, uppercase tag names, Unicode text).
"""

from __future__ import annotations

import datetime as _dt
import random

import pyarrow as pa

FIRST = ["John", "Jane", "Mary", "James", "Robert", "Michael", "Elon", "Angela",
         "Marie", "Boris", "Emmanuel", "Satya", "Sundar", "Hillary", "Kamala",
         "Peter", "Paul", "Andrew", "Ursula", "Theresa"]
LAST = ["Smith", "Johnson", "Miller", "Musk", "Merkel", "Curie", "Macron",
        "Nadella", "Pichai", "Clinton", "Harris", "Parker", "Walker", "Wright",
        "Lehmann", "Dubois", "Rossi", "Tanaka", "Novak", "Berg"]
ORGS = ["Acme Corp", "Globex Inc", "Initech Ltd", "Umbrella Group", "Stark Industries",
        "Wayne Foundation", "Cyberdyne Systems Inc", "Tyrell Corporation",
        "Hooli Inc", "Vandelay Industries", "Wonka Industries Ltd", "Gringotts Bank",
        "Bank of Metropolis", "University of Gotham", "Oscorp Inc", "Soylent Corp"]
KNOWN_ORG = ["Google", "Apple", "Microsoft", "Amazon", "Tesla", "NASA", "NATO",
             "Reuters", "Bloomberg", "Netflix", "Uber", "PayPal"]
LOCS = ["Paris", "London", "Tokyo", "Berlin", "Rome", "Madrid", "Moscow", "Beijing",
        "Dubai", "Singapore", "Sydney", "Toronto", "Chicago", "Boston", "Washington",
        "New York", "California", "Texas", "Germany", "France", "Japan", "Canada"]
TRIGGERS_PAST = ["founded", "acquired", "attacked", "launched", "hired", "sued",
                 "merged", "bought", "sold", "met", "visited", "announced",
                 "arrested", "elected", "invaded", "built", "released"]
MONTHS = ["January", "February", "March", "April", "May", "June", "July",
          "August", "September", "October", "November", "December"]

_LANGS = ["en", "en", "en", "en", "en", "en", "de", "fr", "es", "ja"]

_DE_WORDS = ["Straße", "Müller", "über", "die", "Zeitung", "berichtet", "daß",
             "Unternehmen", "wächst", "schnell", "für", "Jahr"]
_FR_WORDS = ["société", "annoncé", "déjà", "être", "après", "développement",
             "marché", "économie", "française", "très"]
_ES_WORDS = ["compañía", "anunció", "según", "año", "español", "mañana",
             "crecimiento", "mercado", "niño", "rápido"]
_JA_WORDS = ["東京", "会社", "発表", "した", "日本", "経済", "市場", "成長",
             "新しい", "技術"]


def _person(rng: random.Random) -> str:
    return f"{rng.choice(FIRST)} {rng.choice(LAST)}"


def _sentences(rng: random.Random, lang: str) -> list[str]:
    """Entity-rich body sentences with deterministic content."""
    per1, per2 = _person(rng), _person(rng)
    org1 = rng.choice(ORGS)
    org2 = rng.choice(KNOWN_ORG)
    loc1, loc2 = rng.choice(LOCS), rng.choice(LOCS)
    year = rng.randint(1990, 2025)
    month = rng.choice(MONTHS)
    day = rng.randint(1, 28)
    money = f"${rng.randint(1, 900)}.{rng.randint(0, 9)} {rng.choice(['million', 'billion'])}"
    pct = f"{rng.randint(1, 99)}.{rng.randint(0, 9)}%"
    email = f"{per1.split()[0].lower()}@{org1.split()[0].lower()}.example"
    phone = f"({rng.randint(200, 999)}) {rng.randint(200, 999)}-{rng.randint(1000, 9999)}"
    url = f"https://www.{org1.split()[0].lower()}.example/news/{year}"
    trig = rng.choice(TRIGGERS_PAST)
    time_s = f"{rng.randint(1, 12)}:{rng.randint(10, 59)} PM"

    sents = [
        f"Dr. {per1} {trig} {org1} in {loc1} on {month} {day}, {year}.",
        f"{org2} raised {money} ({pct}) according to reports.",
        f"Contact: {email} or call {phone}.",
        f"Visit {url} for details at {time_s}.",
        f"{per2} works for {org2} and was born in {loc2}.",
        f"He said {org1} did not attack the market leader.",
        f"Mr. {per2.split()[1]} met {per1} near {loc1}.",
        f"The Bank of {loc2} merged with {org1} for {money}.",
        f"She visited {loc1} and {loc2} on {day}/{rng.randint(1, 12)}/{year}.",
        f"Every employee of {org1} will be hired by {org2}.",
    ]
    rng.shuffle(sents)
    sents = sents[: rng.randint(4, 9)]
    if lang == "de":
        sents.append(" ".join(rng.choice(_DE_WORDS) for _ in range(10)) + ".")
    elif lang == "fr":
        sents.append(" ".join(rng.choice(_FR_WORDS) for _ in range(10)) + ".")
    elif lang == "es":
        sents.append(" ".join(rng.choice(_ES_WORDS) for _ in range(10)) + ".")
    elif lang == "ja":
        sents.append("".join(rng.choice(_JA_WORDS) for _ in range(12)) + "。")
    return sents


_ADVERSARIAL = [
    "Fish &amp; Chips &#8217;best&#8221; in town&#33;",
    "Unmatched &foo entity and &bar<b>tag</b> leak.",
    "Numbers &#65;&#66;&#67; and hex &#x41; stay.",
    "Spaces&nbsp;and&nbsp;more.",
]


def generate_page(idx: int, seed: int = 42) -> dict:
    rng = random.Random((seed << 32) ^ idx)
    lang = rng.choice(_LANGS)
    site = rng.randint(0, 499)
    url = f"https://site{site}.example/page/{idx}"
    ts = _dt.datetime(2024, 1, 1) + _dt.timedelta(
        seconds=rng.randint(0, 365 * 24 * 3600)
    )

    sents = _sentences(rng, lang)
    paras = []
    k = 0
    while k < len(sents):
        take = rng.randint(1, 3)
        paras.append(" ".join(sents[k : k + take]))
        k += take
    if rng.random() < 0.3:
        paras.append(rng.choice(_ADVERSARIAL))

    nav_items = "".join(
        f"<li><a href='/{w}'>{w.title()}</a></li>" for w in ["home", "world", "tech"]
    )
    style = "<style>body { font: 12px 'Helvetica'; } .nav > li { display: inline; }</style>"
    script = (
        "<script type='text/javascript'>var t = '<p>fake</p>'; "
        "if (a < b && c > d) { track('&amp;'); }</script>"
    )
    body_parts = []
    for i, p in enumerate(paras):
        tag = rng.choice(["p", "p", "p", "div", "li"])
        attrs = rng.choice(["", " class='body'", " id='s%d'" % i, " data-x='a>b'"])
        tago = tag.upper() if rng.random() < 0.1 else tag
        body_parts.append(f"<{tago}{attrs}>{p}</{tago}>")
    title = f"Site {site} report {idx}"
    html = (
        f"<html><head><title>{title}</title>{style}{script}</head>"
        f"<body><div class='nav'><ul>{nav_items}</ul></div>"
        f"<h1>{title}</h1>" + "".join(body_parts) + "<div class='footer'>&copy; 2024 Site"
        f"{site} &amp; partners</div></body></html>"
    )
    return {
        "url": url,
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": "",
        "lang": lang,
    }


def generate_pages_table(start: int, count: int, seed: int = 42) -> pa.Table:
    rows = [generate_page(i, seed) for i in range(start, start + count)]
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )


def write_pages_parquet(
    out_dir: str, num_pages: int, seed: int = 42, pages_per_file: int = 2000
) -> list[str]:
    """Write the pages table as multiple parquet files (block-splittable)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    start = 0
    part = 0
    while start < num_pages:
        n = min(pages_per_file, num_pages - start)
        t = generate_pages_table(start, n, seed)
        path = os.path.join(out_dir, f"pages_{part:05d}.parquet")
        pq.write_table(t, path)
        paths.append(path)
        start += n
        part += 1
    return paths
