"""Regenerate ksj2gp_spark/ksj/_codelist_data.py and _colname_data.py.

Transcribes the reference's public translation dictionaries
(/root/reference/rust/src/translate/data/{codelists,colnames}.rs — themselves
generated from the public kokudosuuchi R package) into Python data modules.
This is the correctness contract of the converter: the code→label and
col-id→name pairs ARE the behavior being re-expressed, so they are carried
verbatim; all *logic* around them is original (ksj/codelists.py,
ksj/colnames.py).

Run from the repo root:  python tools/gen_ref_data.py
"""

from __future__ import annotations

import re
from pathlib import Path

REF = Path("/root/reference/rust/src/translate")
OUT = Path(__file__).resolve().parent.parent / "ksj2gp_spark" / "ksj"


def strip_comments(src: str) -> str:
    """Remove Rust line comments, respecting string literals."""
    out: list[str] = []
    i, n = 0, len(src)
    in_str = False
    while i < n:
        c = src[i]
        if in_str:
            if c == "\\":
                out.append(src[i : i + 2])
                i += 2
                continue
            if c == '"':
                in_str = False
            out.append(c)
            i += 1
        else:
            if c == '"':
                in_str = True
                out.append(c)
                i += 1
            elif c == "/" and i + 1 < n and src[i + 1] == "/":
                while i < n and src[i] != "\n":
                    i += 1
            else:
                out.append(c)
                i += 1
    return "".join(out)


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "'": "'", "0": "\0"}


def string_literals(src: str) -> list[str]:
    """All Rust string literals in order, unescaped."""
    lits: list[str] = []
    i, n = 0, len(src)
    while i < n:
        if src[i] == '"':
            buf: list[str] = []
            i += 1
            while i < n and src[i] != '"':
                if src[i] == "\\":
                    nxt = src[i + 1]
                    if nxt == "u":  # \u{XXXX}
                        m = re.match(r"u\{([0-9a-fA-F]+)\}", src[i + 1 :])
                        assert m, f"bad unicode escape at {i}"
                        buf.append(chr(int(m.group(1), 16)))
                        i += 1 + m.end()
                        continue
                    buf.append(_ESCAPES[nxt])
                    i += 2
                else:
                    buf.append(src[i])
                    i += 1
            i += 1
            lits.append("".join(buf))
        else:
            i += 1
    return lits


def block_between(src: str, start: int, open_ch: str = "[", close_ch: str = "]") -> str:
    """Bracket-matched slice starting at the first open_ch at/after start."""
    i = src.index(open_ch, start)
    depth = 0
    in_str = False
    skip_next = False
    for j in range(i, len(src)):
        c = src[j]
        if skip_next:
            skip_next = False
            continue
        if in_str:
            if c == "\\":
                # consume the escaped character too, so \" does not end
                # the string and a bracket after it is not miscounted
                skip_next = True
                continue
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c == open_ch:
            depth += 1
        elif c == close_ch:
            depth -= 1
            if depth == 0:
                return src[i : j + 1]
    raise ValueError("unbalanced block")


def parse_codelists() -> tuple[dict[str, list[tuple[str, str]]], list[tuple[str, str]]]:
    data_src = strip_comments((REF / "data" / "codelists.rs").read_text())
    maps: dict[str, list[tuple[str, str]]] = {}
    for m in re.finditer(r"pub\(crate\) static (\w+): LazyLock<HashMap", data_src):
        body = block_between(data_src, m.end())
        lits = string_literals(body)
        assert len(lits) % 2 == 0, f"{m.group(1)}: odd literal count"
        maps[m.group(1)] = list(zip(lits[::2], lits[1::2]))

    disp_src = strip_comments((REF / "codelists.rs").read_text())
    registry: list[tuple[str, str]] = []
    seen: set[str] = set()
    for m in re.finditer(r'map\.entry\("([^"]+)"\)\.or_insert\(&(\w+)\);', disp_src):
        key, target = m.group(1), m.group(2)
        if key not in seen:  # or_insert: first wins
            seen.add(key)
            registry.append((key, target))
    return maps, registry


def parse_colnames() -> tuple[list[tuple[str, str]], dict[str, list[str]]]:
    src = strip_comments((REF / "data" / "colnames.rs").read_text())
    m = re.search(r"pub\(crate\) const COLNAMES: &\[\(&str, &str\)\] = &", src)
    body = block_between(src, m.end())
    lits = string_literals(body)
    assert len(lits) % 2 == 0
    colnames = list(zip(lits[::2], lits[1::2]))

    arrays: dict[str, list[str]] = {}
    for m in re.finditer(r"pub\(crate\) const (\w+): (?:\[&str; \d+\]|&\[&str\]) = &?", src):
        if m.group(1) == "COLNAMES":
            continue
        arrays[m.group(1)] = string_literals(block_between(src, m.end()))
    return colnames, arrays


def py_str(s: str) -> str:
    return repr(s)


# Maps not present in the reference tables, kept for repo-local features
# (JIS X 0401 prefecture codes, used by tests/fixtures via extra_codelists).
EXTRA_CODELISTS = {
    "PREF_CD": [
        ("1", "北海道"), ("2", "青森県"), ("3", "岩手県"), ("4", "宮城県"),
        ("5", "秋田県"), ("6", "山形県"), ("7", "福島県"), ("8", "茨城県"),
        ("9", "栃木県"), ("10", "群馬県"), ("11", "埼玉県"), ("12", "千葉県"),
        ("13", "東京都"), ("14", "神奈川県"), ("15", "新潟県"), ("16", "富山県"),
        ("17", "石川県"), ("18", "福井県"), ("19", "山梨県"), ("20", "長野県"),
        ("21", "岐阜県"), ("22", "静岡県"), ("23", "愛知県"), ("24", "三重県"),
        ("25", "滋賀県"), ("26", "京都府"), ("27", "大阪府"), ("28", "兵庫県"),
        ("29", "奈良県"), ("30", "和歌山県"), ("31", "鳥取県"), ("32", "島根県"),
        ("33", "岡山県"), ("34", "広島県"), ("35", "山口県"), ("36", "徳島県"),
        ("37", "香川県"), ("38", "愛媛県"), ("39", "高知県"), ("40", "福岡県"),
        ("41", "佐賀県"), ("42", "長崎県"), ("43", "熊本県"), ("44", "大分県"),
        ("45", "宮崎県"), ("46", "鹿児島県"), ("47", "沖縄県"),
    ],
}


def emit_codelists(maps: dict[str, list[tuple[str, str]]], registry: list[tuple[str, str]]) -> None:
    lines = [
        '"""KSJ codelist dictionaries + dispatch registry (GENERATED — do not edit).',
        "",
        "Generated by tools/gen_ref_data.py from the reference's public data",
        "tables (/root/reference/rust/src/translate/data/codelists.rs and the",
        "registry in translate/codelists.rs:65-330, themselves generated from",
        "the public kokudosuuchi R package). The code→label pairs are the",
        "correctness contract of the converter and are carried verbatim; maps",
        "are keyed by the reference's static names. REGISTRY maps column-id →",
        "map name with first-wins semantics (the reference uses",
        "HashMap::entry().or_insert). PREF_CD is a repo-local extra (JIS X",
        '0401), not part of the reference tables."""',
        "",
        "CODELISTS: dict[str, dict[str, str]] = {",
    ]
    for name, pairs in maps.items():
        lines.append(f"    {py_str(name)}: {{")
        for k, v in pairs:
            lines.append(f"        {py_str(k)}: {py_str(v)},")
        lines.append("    },")
    for name, pairs in EXTRA_CODELISTS.items():
        lines.append(f"    {py_str(name)}: {{")
        for k, v in pairs:
            lines.append(f"        {py_str(k)}: {py_str(v)},")
        lines.append("    },")
    lines.append("}")
    lines.append("")
    lines.append("REGISTRY: dict[str, str] = {")
    for key, target in registry:
        lines.append(f"    {py_str(key)}: {py_str(target)},")
    lines.append("}")
    (OUT / "_codelist_data.py").write_text("\n".join(lines) + "\n")


def emit_colnames(colnames: list[tuple[str, str]], arrays: dict[str, list[str]]) -> None:
    lines = [
        '"""KSJ column-name dictionaries (GENERATED — do not edit).',
        "",
        "Generated by tools/gen_ref_data.py from the reference's public data",
        "table (/root/reference/rust/src/translate/data/colnames.rs, itself",
        "generated from the public kokudosuuchi R package). The reference",
        "builds a HashMap by inserting the flat pair list in order (later",
        "duplicates overwrite, translate/colnames.rs:12-18); a Python dict",
        'built the same way has identical last-wins semantics."""',
        "",
        "COLNAMES: dict[str, str] = {",
    ]
    for k, v in colnames:
        lines.append(f"    {py_str(k)}: {py_str(v)},")
    lines.append("}")
    for name, vals in arrays.items():
        lines.append("")
        lines.append(f"{name}: list[str] = [")
        for v in vals:
            lines.append(f"    {py_str(v)},")
        lines.append("]")
    (OUT / "_colname_data.py").write_text("\n".join(lines) + "\n")


def main() -> None:
    maps, registry = parse_codelists()
    colnames, arrays = parse_colnames()
    n_pairs = sum(len(p) for p in maps.values())
    missing = [t for _, t in registry if t not in maps]
    assert not missing, f"registry targets without maps: {missing}"
    emit_codelists(maps, registry)
    emit_colnames(colnames, arrays)
    print(
        f"codelists: {len(maps)} maps, {n_pairs} pairs; registry: {len(registry)} entries\n"
        f"colnames: {len(colnames)} pairs (dict {len(dict(colnames))}); "
        f"arrays: {', '.join(f'{k}={len(v)}' for k, v in arrays.items())}"
    )


if __name__ == "__main__":
    main()
