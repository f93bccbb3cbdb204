"""Live-reloadable Verilog-A modules — the role of the reference's Revise
integration (SURVEY.md §2.8: edit a ``.va`` file, the model updates without
restarting the session)."""

from __future__ import annotations

import os
import re

from cedarsim_tpu.va.codegen import load_va

_INCLUDE_RE = re.compile(r'`include\s+"([^"]+)"')


def _watched_files(path, include_paths):
    """The file plus any \\`include'd files resolvable on the search path."""
    files = [path]
    try:
        text = open(path).read()
    except OSError:
        return files
    dirs = [os.path.dirname(os.path.abspath(path)), *include_paths]
    for name in _INCLUDE_RE.findall(text):
        for d in dirs:
            cand = os.path.join(d, name)
            if os.path.exists(cand):
                files.append(cand)
                break
    return files


def load_va_file(path, include_paths=()):
    """Parse + compile a ``.va`` file → {module-name: DeviceModel class}."""
    with open(path) as f:
        text = f.read()
    paths = (os.path.dirname(os.path.abspath(path)), *include_paths)
    return load_va(text, file=os.path.basename(path), include_paths=paths)


class VAWatch:
    """Holds the compiled classes for a ``.va`` file and re-compiles when
    the file (or an include) changes on disk::

        w = VAWatch("myres.va")
        ckt.add(w.classes["myres"], ...)
        ...edit myres.va...
        if w.reload():          # -> True, classes recompiled
            rebuild_circuit(w.classes)
    """

    def __init__(self, path, include_paths=()):
        self.path = path
        self.include_paths = tuple(include_paths)
        self.classes = load_va_file(path, include_paths)
        self._mtimes = self._stat()

    def _stat(self):
        return {f: os.path.getmtime(f)
                for f in _watched_files(self.path, self.include_paths)
                if os.path.exists(f)}

    def changed(self) -> bool:
        return self._stat() != self._mtimes

    def reload(self) -> bool:
        """Recompile if anything changed; True when classes were updated."""
        if not self.changed():
            return False
        self.classes = load_va_file(self.path, self.include_paths)
        self._mtimes = self._stat()
        return True
