"""Deterministic Common-Crawl-style pages corpus (FIXTURES.md §1).

Schema mandated by BASELINE.json ``input_hint``::

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

``text`` is the golden extraction of ``html``; the pipeline's S1 stage
must reproduce it byte-identically per url.  All content is a pure
function of ``(SEED, doc_id)`` via blake2 hashes — no RNG draw order, no
wall clock — so sf0.001 is a strict prefix of sf0.01 etc., and the same
corpus regenerates bit-identically on every node.

Alongside ``pages`` the generator emits ``gold_mentions``
(url, seq, surface, norm, entity_id, label): the ground truth used to
derive the labeled-pair eval set (FIXTURES.md §4).
"""

from __future__ import annotations

import html as _html
import os
import struct
import hashlib

import pyarrow as pa
import pyarrow.parquet as pq

from kawa_ray.sources.roster import SEED, build_roster, normalize_surface

EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z in seconds

LANG_WHEEL = (
    ["en"] * 40 + ["es"] * 10 + ["fr"] * 8 + ["de"] * 8 + ["pt"] * 8
    + ["vi"] * 6 + ["ar"] * 6 + ["zh"] * 6 + ["ja"] * 4 + ["ko"] * 4
)

_FILLER = {
    "en": ("market report shows growth while local officials discuss policy the "
           "committee announced results during annual meeting about trade and "
           "weather falcon heron quince willow miller energy prices rose sharply "
           "analysts expect further changes next quarter").split(),
    "es": ("el mercado informe muestra crecimiento mientras funcionarios locales "
           "discuten la política comité anunció resultados durante reunión anual "
           "sobre comercio y clima los precios subieron bruscamente").split(),
    "fr": ("le marché rapport montre croissance tandis que responsables locaux "
           "discutent la politique comité a annoncé résultats pendant réunion "
           "annuelle sur commerce et météo les prix ont augmenté").split(),
    "de": ("der markt bericht zeigt wachstum während lokale beamte die politik "
           "diskutieren ausschuss gab ergebnisse während jährlicher sitzung über "
           "handel und wetter die preise stiegen stark").split(),
    "pt": ("o mercado relatório mostra crescimento enquanto autoridades locais "
           "discutem a política comitê anunciou resultados durante reunião anual "
           "sobre comércio e clima os preços subiram").split(),
    "vi": ("thị trường báo cáo cho thấy tăng trưởng trong khi quan chức địa "
           "phương thảo luận chính sách ủy ban công bố kết quả cuộc họp thường "
           "niên về thương mại giá cả tăng mạnh").split(),
    "ar": ("السوق تقرير يظهر نموا بينما مسؤولون محليون يناقشون السياسة اللجنة "
           "اعلنت النتائج خلال الاجتماع السنوي حول التجارة ارتفعت الاسعار").split(),
    "zh": list("市场报告显示增长同时地方官员讨论政策委员会宣布年度会议结果贸易天气价格上涨分析师预计变化"),
    "ja": list("市場報告は成長を示す一方地元当局は政策を議論委員会は年次会合で結果を発表貿易天候価格上昇"),
    "ko": list("시장보고서는성장을보여주고지역관리들은정책을논의위원회는연례회의에서결과를발표무역날씨가격상승"),
}

_NAV_WORDS = ["Home", "About", "Contact", "Privacy", "Terms", "Archive", "Login"]


def _h(*parts) -> int:
    raw = ":".join(str(p) for p in parts).encode("utf-8")
    return struct.unpack("<Q", hashlib.blake2b(raw, digest_size=8).digest())[0]


def _pick_alias(aliases: list[str], lang: str, h: int) -> str:
    """Prefer a script-appropriate alias for the page language."""
    def script_of(s: str) -> str:
        c = s[0]
        if "一" <= c <= "鿿":
            return "zh"
        if "぀" <= c <= "ヿ":
            return "ja"
        if "가" <= c <= "힣":
            return "ko"
        if "؀" <= c <= "ۿ":
            return "ar"
        return "latin"

    want = lang if lang in ("zh", "ja", "ko", "ar") else "latin"
    pool = [a for a in aliases if script_of(a) == want] or [a for a in aliases if script_of(a) == "latin"] or aliases
    return pool[h % len(pool)]


class PageGenerator:
    """Stateless per-doc page renderer over a fixed roster."""

    def __init__(self, n_entities: int = 300):
        self.roster = build_roster(n_entities)
        self.entity_ids = self.roster["entity_id"].to_pylist()
        self.labels = dict(zip(self.entity_ids, self.roster["label"].to_pylist()))
        self.aliases = dict(zip(self.entity_ids, self.roster["aliases"].to_pylist()))
        # the designated hot entity: its short surname alias lands in ~6% of
        # pages -> a stopword-like hot blocking key (FIXTURES.md §4)
        self.hot_eid = 3
        self.hot_surface = "Smith"

    _TOPIC_CONS = "bdfgklmnprstvz"

    def topic_words(self, eid: int, h: int, k: int = 2) -> list[str]:
        """``k`` of the entity's 4 deterministic topic words — the
        entity-specific context real pages have (an entity co-occurs with
        its domain vocabulary), which the E1 contextual-embedding channel
        needs to carry signal.  Shapes like 'zqbodafu' never collide with
        roster surfaces or filler."""
        out = []
        for j in range(k):
            hw = _h(SEED, "topic", eid, (h >> (8 * j)) % 4)
            body = "".join(
                self._TOPIC_CONS[(hw >> (4 * i)) % len(self._TOPIC_CONS)]
                + "aeiou"[(hw >> (4 * i + 2)) % 5]
                for i in range(3)
            )
            out.append("zq" + body)
        return out

    def render(self, doc_id: int) -> tuple[dict, list[tuple[str, int, str]]]:
        """-> (page row dict, [(surface, entity_id, label), ...] in order)."""
        h0 = _h(SEED, "page", doc_id)
        site_id = h0 % 200
        lang = LANG_WHEEL[_h(SEED, "sitelang", site_id) % len(LANG_WHEEL)]
        url = f"https://site{site_id:04d}.example/{lang}/doc{doc_id:06d}"
        warc_ts = (EPOCH_2024 + doc_id * 137) * 1_000_000  # timestamp[us]

        filler = _FILLER[lang]
        n_paras = 2 + h0 % 4
        n_mentions = _h(SEED, "nm", doc_id) % 9
        mention_specs: list[tuple[str, int, str]] = []
        for m in range(n_mentions):
            hm = _h(SEED, "ment", doc_id, m)
            if hm % 16 == 0:  # ~6%: the hot surface
                eid, surface = self.hot_eid, self.hot_surface
            else:
                eid = self.entity_ids[hm % len(self.entity_ids)]
                surface = _pick_alias(self.aliases[eid], lang, hm >> 32)
            mention_specs.append((surface, eid, self.labels[eid]))

        # distribute mentions over paragraphs
        per_para: list[list[tuple[str, int, str]]] = [[] for _ in range(n_paras)]
        for m, spec in enumerate(mention_specs):
            per_para[_h(SEED, "mp", doc_id, m) % n_paras].append(spec)

        title_words = [filler[_h(SEED, "tw", doc_id, i) % len(filler)] for i in range(3)]
        title = " ".join(title_words + [f"no {doc_id % 97}"])

        text_blocks = [title]
        html_parts = [
            "<html><head><title>", _html.escape(title), "</title>",
            "<style>body{font:12px}</style></head><body>",
            "<header><nav><ul>",
            "".join(f"<li>{w}</li>" for w in _NAV_WORDS[: 3 + h0 % 4]),
            "</ul></nav></header>",
        ]
        heading = " ".join(
            filler[_h(SEED, "hw", doc_id, i) % len(filler)] for i in range(2)
        )
        html_parts.append(f"<h1>{_html.escape(heading)}</h1>")
        text_blocks.append(heading)

        ordered_mentions: list[tuple[str, int, str]] = []
        for p in range(n_paras):
            hp = _h(SEED, "para", doc_id, p)
            n_words = 12 + hp % 18
            words = [filler[_h(SEED, "w", doc_id, p, i) % len(filler)] for i in range(n_words)]
            # occasional ampersand + numeric entity to exercise unescaping
            if hp % 5 == 0 and n_words > 4:
                words[2] = words[2] + " & " + words[3]
                del words[3]
            tokens_text: list[str] = []
            tokens_html: list[str] = []
            specs = per_para[p]
            # insertion points, >=2 filler words apart
            slots = sorted({2 + (_h(SEED, "slot", doc_id, p, k) % max(1, len(words) - 3)) // 1
                            for k in range(len(specs))})
            while len(slots) < len(specs):
                slots.append(min(len(words), slots[-1] + 3) if slots else 2)
            spec_iter = iter(sorted(zip(slots, range(len(specs))))[: len(specs)])
            next_slot = next(spec_iter, None)
            si = 0
            for i, w in enumerate(words):
                if next_slot is not None and i == next_slot[0]:
                    surface, eid, label = specs[next_slot[1]]
                    ordered_mentions.append((surface, eid, label))
                    esc = _html.escape(surface)
                    wrapped = (
                        f"<b>{esc}</b>" if _h(SEED, "wrap", doc_id, p, si) % 3 == 0
                        else f'<a href="/e/{eid}">{esc}</a>' if _h(SEED, "wrap", doc_id, p, si) % 3 == 1
                        else esc
                    )
                    tokens_text.append(surface)
                    tokens_html.append(wrapped)
                    topics = self.topic_words(eid, _h(SEED, "tp", doc_id, p, si))
                    tokens_text.extend(topics)
                    tokens_html.extend(_html.escape(t) for t in topics)
                    si += 1
                    next_slot = next(spec_iter, None)
                tokens_text.append(w)
                tokens_html.append(_html.escape(w))
            # trailing mentions whose slot fell past the end
            while next_slot is not None:
                surface, eid, label = specs[next_slot[1]]
                ordered_mentions.append((surface, eid, label))
                tokens_text.append(surface)
                tokens_html.append(_html.escape(surface))
                topics = self.topic_words(eid, _h(SEED, "tpt", doc_id, p, len(ordered_mentions)))
                tokens_text.extend(topics)
                tokens_html.extend(_html.escape(t) for t in topics)
                next_slot = next(spec_iter, None)
            para_text = " ".join(tokens_text) + "."
            para_html = " ".join(tokens_html) + "."
            text_blocks.append(para_text)
            html_parts.append(f"<p>{para_html}</p>")
            if hp % 4 == 0:
                html_parts.append("<script>var x = %d; track(x);</script>" % (hp % 100))

        # ~20% of pages carry a contact block with regex-typed PII spans so
        # the B14 extractors fire end-to-end (labels are non-linkable: they
        # surface as mentions but never enter the pair space)
        hc = _h(SEED, "contact", doc_id)
        if hc % 5 == 0:
            email = f"user{hc % 1000}@site{site_id:04d}.example"
            phone = f"+1 555-{100 + hc % 900}-{1000 + (hc >> 8) % 9000}"
            ip = f"10.{hc % 256}.{(hc >> 8) % 256}.{1 + (hc >> 16) % 254}"
            price = f"${1 + hc % 999}.{hc % 100:02d}"
            contact = f"contact {email} call {phone} host {ip} fee {price}"
            text_blocks.append(contact)
            html_parts.append(f"<p>{_html.escape(contact)}</p>")
        # a disjoint ~10% slice carries the long-tail PII kinds (round-2
        # extractor parity: USER_NAME / CRYPTO / ICD / PO Box / ZIP)
        if hc % 10 == 3:
            handle = f"@user_{hc % 997}"
            b58 = "abcdefghijkmnopqrstuvwxyzABCDEFGHJKLMNPQRSTUVWXYZ123456789"
            wallet = "1" + "".join(b58[(hc >> (i % 48)) % 58 + 0] for i in range(28))
            icd = f"J{hc % 10}{(hc >> 4) % 10}.{(hc >> 8) % 10}"
            pobox = f"P.O. Box {100 + hc % 9000}"
            zipc = f"{10000 + hc % 89999}"
            extra = (f"profile {handle} wallet {wallet} code {icd} "
                     f"mail {pobox} area {zipc}")
            text_blocks.append(extra)
            html_parts.append(f"<p>{_html.escape(extra)}</p>")

        html_parts.append(f"<footer>© site{site_id:04d} example</footer></body></html>")
        html = "".join(html_parts).encode("utf-8")
        text = "\n\n".join(text_blocks)
        row = {"url": url, "warc_ts": warc_ts, "html": html, "text": text, "lang": lang}
        return row, ordered_mentions


def generate_pages(n_pages: int, n_entities: int = 300,
                   start: int = 0) -> tuple[pa.Table, pa.Table]:
    """-> (pages table, gold_mentions table) for doc_ids
    [start, start+n_pages), fully deterministic."""
    gen = PageGenerator(n_entities)
    rows = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
    gm = {k: [] for k in ("url", "seq", "surface", "norm", "entity_id", "label")}
    for doc_id in range(start, start + n_pages):
        row, mentions = gen.render(doc_id)
        for k, v in row.items():
            rows[k].append(v)
        for seq, (surface, eid, label) in enumerate(mentions):
            gm["url"].append(row["url"])
            gm["seq"].append(seq)
            gm["surface"].append(surface)
            gm["norm"].append(normalize_surface(surface))
            gm["entity_id"].append(eid)
            gm["label"].append(label)
    pages = pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "warc_ts": pa.array(rows["warc_ts"], pa.timestamp("us")),
            "html": pa.array(rows["html"], pa.binary()),
            "text": pa.array(rows["text"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
        }
    )
    gold = pa.table(
        {
            "url": pa.array(gm["url"], pa.string()),
            "seq": pa.array(gm["seq"], pa.int32()),
            "surface": pa.array(gm["surface"], pa.string()),
            "norm": pa.array(gm["norm"], pa.string()),
            "entity_id": pa.array(gm["entity_id"], pa.int64()),
            "label": pa.array(gm["label"], pa.string()),
        }
    )
    return pages, gold


SF_TO_PAGES = {"0.001": 500, "0.01": 5000, "0.1": 50000, "0.4": 200000, "1.6": 800000}
CACHE_DIR = os.environ.get("KAWA_PAGES_DIR", "/tmp/kawa_ray_pages")
_GEN_VERSION = "v5"  # v5: subword CJK norms  # bump when generator output changes


def sf_of_dir(sf_dir: str) -> str:
    """'/root/testdata/sf0.01' -> '0.01' (defaults to 0.001)."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return base[2:] if base.startswith("sf") else "0.001"


def ensure_pages(sf: str, shards: int = 16) -> str:
    """Generate-and-cache the pages corpus for a scale factor; returns the
    directory containing ``pages.parquet`` (sharded) and
    ``gold_mentions.parquet``.  Atomic: writes to a temp dir then renames,
    so concurrent bench processes share one cache."""
    n_pages = SF_TO_PAGES.get(sf, 500)
    out_dir = os.path.join(CACHE_DIR, f"{_GEN_VERSION}-sf{sf}")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    tmp = out_dir + f".tmp{os.getpid()}"
    os.makedirs(os.path.join(tmp, "pages"), exist_ok=True)
    # shard-by-shard generation: content is a pure function of doc_id, so
    # shards generate independently (Ray-parallel when a session is up)
    # and nothing holds the whole corpus in memory
    n_shards = max(1, min(max(shards, n_pages // 50000), max(1, n_pages // 250)))
    per = (n_pages + n_shards - 1) // n_shards
    ranges = [(s, s * per, min(per, n_pages - s * per)) for s in range(n_shards)
              if s * per < n_pages]

    def one_shard(sid: int, start: int, count: int) -> pa.Table:
        pages, gold = generate_pages(count, start=start)
        pq.write_table(pages, os.path.join(tmp, "pages", f"part-{sid:05d}.parquet"))
        return gold

    try:
        import ray

        ray_up = ray.is_initialized()
    except ImportError:  # pragma: no cover
        ray_up = False
    if ray_up and len(ranges) > 1:
        import ray

        @ray.remote(num_cpus=1)
        def _gen(sid: int, start: int, count: int) -> pa.Table:
            return one_shard(sid, start, count)

        golds = ray.get([_gen.remote(*r) for r in ranges])
    else:
        golds = [one_shard(*r) for r in ranges]
    pq.write_table(pa.concat_tables(golds), os.path.join(tmp, "gold_mentions.parquet"))
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, out_dir)
    except OSError:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)  # another process won the race
    return out_dir
