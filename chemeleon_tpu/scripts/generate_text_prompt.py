"""Training-caption generation for dataset rows.

The reference generates free-text prompts for each mp-40 row with an OpenAI
LLM (reference: data/mp-40/generate_text_prompt.py:49-62, with tenacity
retries). This rebuild:

  * default: a deterministic template engine over the row's structured
    columns (composition, crystal system, space group, lattice parameters) —
    no network, reproducible;
  * optional: any OpenAI-compatible endpoint when OPENAI_API_KEY (and
    optionally OPENAI_BASE_URL) are set and the ``openai`` package is
    installed.
"""

from __future__ import annotations

import csv
import os
import random
from pathlib import Path
from typing import Dict, List, Optional

_TEMPLATES = [
    ("A crystal structure of {composition} with {crystal_system} symmetry"
     " in space group {space_group_symbol}"),
    ("{composition} crystallizing in the {crystal_system} system"
     " ({space_group_symbol})"),
    ("An inorganic {crystal_system} crystal with composition {composition}"),
    ("A {crystal_system} phase of {composition}"),
]


def template_prompt(row: Dict[str, str], rng: random.Random) -> str:
    tpl = rng.choice(_TEMPLATES)
    try:
        return tpl.format(**row)
    except KeyError:
        return f"A crystal structure of {row.get('composition', 'unknown')}"


def _make_llm_client():
    """One client (HTTP session) for the whole CSV, not one per row."""
    if not os.environ.get("OPENAI_API_KEY"):
        return None
    try:
        from openai import OpenAI
    except ImportError:
        return None
    return OpenAI(base_url=os.environ.get("OPENAI_BASE_URL"))


def llm_prompt(row: Dict[str, str], client=None) -> Optional[str]:
    if client is None:
        client = _make_llm_client()
    if client is None:
        return None
    msg = (f"Write one short caption describing an inorganic crystal with "
           f"composition {row.get('composition')} in the "
           f"{row.get('crystal_system')} crystal system, space group "
           f"{row.get('space_group_symbol')}.")
    for _ in range(3):  # simple retry (reference uses tenacity)
        try:
            r = client.chat.completions.create(
                model=os.environ.get("OPENAI_MODEL", "gpt-4o-mini"),
                messages=[{"role": "user", "content": msg}], max_tokens=60)
            return r.choices[0].message.content.strip()
        except Exception:
            continue
    return None


def generate_prompts(csv_in: str, csv_out: str, use_llm: bool = False,
                     seed: int = 0) -> int:
    csv.field_size_limit(10 ** 9)
    rng = random.Random(seed)
    with open(csv_in) as f:
        reader = csv.DictReader(f)
        fieldnames = list(reader.fieldnames or [])
        rows = list(reader)
    client = _make_llm_client() if use_llm else None
    for row in rows:
        p = llm_prompt(row, client) if use_llm else None
        row["prompt"] = p or template_prompt(row, rng)
    Path(csv_out).parent.mkdir(parents=True, exist_ok=True)
    if "prompt" not in fieldnames:
        fieldnames.append("prompt")
    with open(csv_out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames)
        w.writeheader()
        w.writerows(rows)
    return len(rows)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("csv_in")
    ap.add_argument("csv_out")
    ap.add_argument("--llm", action="store_true")
    args = ap.parse_args()
    n = generate_prompts(args.csv_in, args.csv_out, use_llm=args.llm)
    print(f"wrote {n} prompts to {args.csv_out}")
