"""Resolve ASQA gold wikipage titles to wikipedia ids (reference
``scripts/wiki_url_to_id.py``): queries the public wikipedia API for each
distinct title referenced by ASQA answers and pickles the {url: wiki_id} map
used to build retrieval qrels for wiki_asqa.  Requires network access.

Usage: python scripts/wiki_url_to_id.py [out_pickle]
"""

import pickle
import sys
from concurrent.futures import ThreadPoolExecutor

WIKI_API = "https://en.wikipedia.org/w/api.php?action=query&format=json&titles={}"


def fetch_wiki_id(pair):
    import requests

    url, title = pair
    resp = requests.get(WIKI_API.format(title), timeout=30)
    if resp.status_code != 200:
        return None
    pages = resp.json().get("query", {}).get("pages", {})
    if not pages:
        return None
    return url, next(iter(pages))


def main(out_file: str = "asqa_wiki_ids.pkl") -> None:
    import datasets

    ds = datasets.load_dataset("din0s/asqa")["dev"]
    pairs = {}
    for example in ds:
        for wiki in example["wikipages"]:
            if wiki.get("url"):
                # API titles are the last URL path segment
                pairs[wiki["url"]] = wiki["url"].rsplit("/", 1)[-1]

    mapping = {}
    with ThreadPoolExecutor(max_workers=8) as pool:
        for res in pool.map(fetch_wiki_id, pairs.items()):
            if res is not None:
                mapping[res[0]] = res[1]
    with open(out_file, "wb") as f:
        pickle.dump(mapping, f)
    print(f"resolved {len(mapping)}/{len(pairs)} urls → {out_file}")


if __name__ == "__main__":
    main(*sys.argv[1:])
