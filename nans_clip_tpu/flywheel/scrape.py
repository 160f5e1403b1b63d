"""Image scrapers for the data flywheel.

Compact port of reference scripts/scrape_wikimedia.py / scrape_images.py /
scrape_distractors.py: a Wikimedia-Commons API crawler over Song-dynasty
queries writing images + ``metadata.jsonl``, plus a distractor-pool scraper
(hard negatives: other-dynasty artwork; easy negatives: unrelated
categories — reference scrape_distractors.py:36-60). Pure stdlib HTTP with
retry + UA rotation; in zero-egress environments these simply report
failure per URL.

  python -m nans_clip_tpu.flywheel.scrape wikimedia --out data
  python -m nans_clip_tpu.flywheel.scrape distractors --out data/distractors
"""

from __future__ import annotations

import argparse
import hashlib
import json
import logging
import os
import random
import time
import urllib.parse
import urllib.request

logger = logging.getLogger(__name__)

USER_AGENTS = [
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 Chrome/120 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 Chrome/119",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 13_5) Safari/605.1.15",
]

SONG_QUERIES = [
    "Southern Song dynasty painting", "南宋 绘画", "Song dynasty landscape painting",
    "宋代 山水画", "Song dynasty ceramics", "南宋 瓷器", "Song dynasty calligraphy",
    "宋代 书法", "Southern Song Hangzhou", "西湖 南宋", "Ma Yuan painting",
    "Xia Gui painting", "李嵩 画", "Song dynasty album leaf", "宋 册页",
    "Song dynasty fan painting", "南宋 官窑", "龙泉窑", "Song dynasty woodblock",
    "宋刻本", "Southern Song manuscript",
]

HARD_NEGATIVE_QUERIES = [
    "Ming dynasty painting", "Qing dynasty painting", "Tang dynasty painting",
    "Yuan dynasty painting", "Japanese ukiyo-e", "Korean Joseon painting",
]
EASY_NEGATIVE_QUERIES = [
    "modern photography city", "western oil painting", "abstract art",
]


def fetch(url: str, retries: int = 3, timeout: int = 30) -> bytes:
    last = None
    for attempt in range(retries):
        try:
            req = urllib.request.Request(url, headers={
                "User-Agent": random.choice(USER_AGENTS)})
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return r.read()
        except Exception as e:
            last = e
            time.sleep(1.5 * (attempt + 1))
    raise RuntimeError(f"fetch failed after {retries} tries: {url}: {last}")


def commons_search(query: str, limit: int = 50) -> list:
    """Wikimedia Commons file search -> [{title, url, descriptionurl}]."""
    api = ("https://commons.wikimedia.org/w/api.php?action=query&format=json"
           "&generator=search&gsrnamespace=6&gsrlimit={}&gsrsearch={}"
           "&prop=imageinfo&iiprop=url|mime&iiurlwidth=1024").format(
        limit, urllib.parse.quote(query))
    data = json.loads(fetch(api))
    out = []
    for page in data.get("query", {}).get("pages", {}).values():
        info = (page.get("imageinfo") or [{}])[0]
        url = info.get("thumburl") or info.get("url")
        if url and info.get("mime", "").startswith("image/"):
            out.append({"title": page.get("title", ""), "url": url})
    return out


def scrape_queries(queries, out_dir: str, per_query: int, category: str,
                   meta_path: str):
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    with open(meta_path, "a", encoding="utf-8") as meta:
        for q in queries:
            try:
                results = commons_search(q, per_query)
            except Exception as e:
                logger.warning("search failed %r: %s", q, e)
                continue
            for item in results:
                try:
                    raw = fetch(item["url"])
                except Exception as e:
                    logger.warning("download failed %s: %s", item["url"], e)
                    continue
                h = hashlib.sha1(raw).hexdigest()[:16]
                fname = f"{h}.jpg"
                with open(os.path.join(out_dir, fname), "wb") as f:
                    f.write(raw)
                meta.write(json.dumps({
                    "filename": fname, "title": item["title"], "query": q,
                    "category": category, "source": item["url"]},
                    ensure_ascii=False) + "\n")
                n += 1
            time.sleep(0.5)
    logger.info("scraped %d images for %s", n, category)
    return n


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["wikimedia", "distractors"])
    p.add_argument("--out", default="data")
    p.add_argument("--per-query", type=int, default=30)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)

    if args.mode == "wikimedia":
        scrape_queries(SONG_QUERIES, os.path.join(args.out, "images"),
                       args.per_query, "绘画",
                       os.path.join(args.out, "metadata.jsonl"))
    else:
        scrape_queries(HARD_NEGATIVE_QUERIES, os.path.join(args.out, "hard"),
                       args.per_query, "hard_negative",
                       os.path.join(args.out, "distractors_meta.jsonl"))
        scrape_queries(EASY_NEGATIVE_QUERIES, os.path.join(args.out, "easy"),
                       args.per_query // 2, "easy_negative",
                       os.path.join(args.out, "distractors_meta.jsonl"))


if __name__ == "__main__":
    main()
