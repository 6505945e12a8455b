"""File utilities (reference `fish_speech/utils/file.py` +
`utils/braceexpand.py` behaviors).
"""

from __future__ import annotations

import itertools
import re
from pathlib import Path
from typing import Iterator, List, Optional, Union

AUDIO_EXTENSIONS = {
    ".mp3", ".wav", ".flac", ".ogg", ".m4a", ".wma", ".aac", ".aiff",
    ".aif", ".aifc",
}

VIDEO_EXTENSIONS = {".mp4", ".avi"}


def audio_to_bytes(file_path: Optional[str]) -> Optional[bytes]:
    if not file_path or not Path(file_path).exists():
        return None
    return Path(file_path).read_bytes()


def read_ref_text(ref_text: Optional[str]) -> Optional[str]:
    path = Path(ref_text) if ref_text else None
    if path is not None and path.exists():
        return path.read_text(encoding="utf-8")
    return ref_text


def list_files(
    path: Union[Path, str],
    extensions: Optional[set] = None,
    recursive: bool = False,
    sort: bool = True,
) -> List[Path]:
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Directory {path} does not exist.")
    it = path.rglob("*") if recursive else path.glob("*")
    files = [
        f for f in it
        if f.is_file() and (extensions is None or f.suffix.lower() in extensions)
    ]
    return sorted(files) if sort else files


def get_latest_checkpoint(dirname: Union[Path, str]) -> Optional[Path]:
    """Newest checkpoint by mtime (reference `file.py:27-38`)."""
    dirname = Path(dirname)
    if not dirname.is_dir():
        return None
    ckpts = sorted(
        itertools.chain(dirname.glob("*.ckpt"), dirname.glob("step_*")),
        key=lambda p: p.stat().st_mtime,
    )
    return ckpts[-1] if ckpts else None


def load_filelist(path: Union[Path, str]) -> List[tuple]:
    """Bert-VITS2-style filelist: `path|speaker|language|text` per line."""
    out = []
    for line in Path(path).read_text(encoding="utf-8").splitlines():
        line = line.strip()
        if not line:
            continue
        parts = line.split("|")
        if len(parts) == 4:
            out.append(tuple(parts))
    return out


# -- brace expansion (the reference vendors a 217-line braceexpand; this is
#    a compact equivalent supporting lists {a,b,c} and ranges {1..9}) --

_RANGE_RE = re.compile(r"^(-?\d+)\.\.(-?\d+)(?:\.\.(-?\d+))?$")


def braceexpand(pattern: str) -> Iterator[str]:
    start = pattern.find("{")
    if start == -1:
        yield pattern
        return
    depth = 0
    for i in range(start, len(pattern)):
        if pattern[i] == "{":
            depth += 1
        elif pattern[i] == "}":
            depth -= 1
            if depth == 0:
                end = i
                break
    else:
        yield pattern
        return

    prefix, body, suffix = pattern[:start], pattern[start + 1 : end], pattern[end + 1 :]

    m = _RANGE_RE.match(body)
    if m:
        lo, hi = int(m.group(1)), int(m.group(2))
        step = int(m.group(3)) if m.group(3) else (1 if hi >= lo else -1)
        stop = hi + (1 if step > 0 else -1)
        width = None
        if m.group(1).lstrip("-").startswith("0") or m.group(2).lstrip("-").startswith("0"):
            width = max(len(m.group(1).lstrip("-")), len(m.group(2).lstrip("-")))
        options = [
            (f"{abs(v):0{width}d}" if width else str(abs(v)))
            if v >= 0 else "-" + (f"{abs(v):0{width}d}" if width else str(abs(v)))
            for v in range(lo, stop, step)
        ]
    else:
        # split on top-level commas
        options, buf, depth = [], "", 0
        for ch in body:
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
            if ch == "," and depth == 0:
                options.append(buf)
                buf = ""
            else:
                buf += ch
        options.append(buf)
        if len(options) == 1:  # not a real brace list
            for rest in braceexpand(suffix):
                yield prefix + "{" + body + "}" + rest
            return

    for opt in options:
        for expanded_opt in braceexpand(opt):
            for rest in braceexpand(suffix):
                yield prefix + expanded_opt + rest
