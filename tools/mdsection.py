"""Shared helper: replace one '## ...' section of a markdown file in
place (bench tools each own a section of BENCH/BASELINE.md; appending
blindly duplicated tables in early rounds)."""

from __future__ import annotations


def replace_section(path: str, header: str, section: str) -> None:
    """Rewrite the section starting at ``header`` (through the next
    '\\n## ') with ``section``; append it if the header is absent.
    ``section`` must begin with ``header``."""
    assert section.startswith(header)
    with open(path, encoding="utf-8") as f:
        md = f.read()
    if header in md:
        start = md.index(header)
        nxt = md.find("\n## ", start + len(header))
        end = nxt + 1 if nxt != -1 else len(md)
        md = md[:start] + section + "\n" + md[end:]
    else:
        md = md.rstrip("\n") + "\n\n" + section
    with open(path, "w", encoding="utf-8") as f:
        f.write(md)
