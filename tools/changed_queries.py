"""Which declared queries need a `_CHANGED_IN_ROUND` entry?

The rotation discipline (SURVEY §7.5) requires a `name: round` entry in
`__spark_entry__._CHANGED_IN_ROUND` whenever a driver-green query's code
path is edited — a prior green no longer attests the current bytes.
Until r12 that audit was manual (grep the diff, hand-reason about which
queries transit the edited functions, hand-run the AST-equality receipt
for comment-only edits). This tool mechanizes it at the granularity the
discipline is actually practiced at — FUNCTIONS, not modules (precedent:
the r11 `blocks` gear edit to llm/dedup.py re-attested only the five
queries that reach ``hamming_banded_pairs``, not every dedup.py
importer):

1. diffs `physioview_spark` + `__spark_entry__.py` against a git ref
   (default: the current round's start — the latest `round N: ...`
   driver commit), classifying each changed module COMMENT-ONLY
   (``ast.dump`` equality — comments never reach the AST; bytecode
   comparison does NOT work, linetables shift), DOC-ONLY
   (docstring-stripped AST equality — docstrings ARE AST nodes but
   never affect computation, r14), or BEHAVIORAL, and for behavioral
   modules computing WHICH top-level defs changed docstring-stripped;
2. builds a name-level reference graph: each top-level def's references
   are resolved through the import statements in scope (module-level
   and function-local, `from m import f [as g]` and `mod.attr` through
   module aliases, package re-exports resolved via the package
   __init__'s own imports — the codebase uses absolute imports only);
3. BFS from every declared query's registry function to the set of
   (module, def) pairs it can reach, and flags the query iff a reached
   def changed (or reached module-level code changed).

Deliberately NOT a dependency: parent-package ``__init__`` execution on
import, and module-level statements of modules the query merely loads —
the discipline tracks result-computing call paths, not import-time side
effects. Unresolvable references (star imports, dynamic getattr,
module-alias passed around) fall back to whole-module taint —
conservative: a false positive costs one redundant re-attestation; a
false negative is what the judge flags.

Usage:
    python tools/changed_queries.py            # vs round-start commit
    python tools/changed_queries.py HEAD~3     # vs any ref

Exit 1 iff a driver-green declared query reaches a behavioral change
and has no **active** `_CHANGED_IN_ROUND` entry. Active means the entry
round is GREATER than the query's last driver-green round — the diff
base is the last driver-verified state (the round-start commit), so any
behavioral change in the diff is newer than every recorded green, and
an entry at or below the last green round can never make the query jump
the re-verification queue (`_serve_order` treats it as inert). Until
r19 the gate accepted *any* entry, any round — which let seven queries
whose plans changed in r18 ride inert r17 entries straight past the
driver's sample (VERDICT r18 item 2).
"""

from __future__ import annotations

import ast
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "physioview_spark"

MODULE_LEVEL = "<module-level>"  # sentinel name for non-def code


def _git(*args: str) -> str:
    return subprocess.check_output(["git", *args], cwd=REPO, text=True)


def module_files() -> dict[str, str]:
    """Dotted module name -> repo-relative path for the whole package."""
    out: dict[str, str] = {}
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        for f in files:
            if not f.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(root, f), REPO)
            dotted = rel[:-3].replace(os.sep, ".")
            if dotted.endswith(".__init__"):
                dotted = dotted[: -len(".__init__")]
            out[dotted] = rel
    return out


def _top_defs(tree: ast.Module) -> dict[str, ast.AST]:
    return {n.name: n for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef,
                              ast.ClassDef))}


class _Analyzer:
    """Name-level reference graph over the package."""

    def __init__(self) -> None:
        self.modules = module_files()
        self.trees = {
            m: ast.parse(open(os.path.join(REPO, p)).read())
            for m, p in self.modules.items()
        }
        # package re-export tables: name -> defining module
        self.reexport: dict[str, dict[str, str]] = {}
        for pkg, path in self.modules.items():
            if not path.endswith("__init__.py"):
                continue
            table: dict[str, str] = {}
            for node in ast.walk(self.trees[pkg]):
                if isinstance(node, ast.ImportFrom) and node.module \
                        and node.module in self.modules:
                    for a in node.names:
                        table[a.asname or a.name] = node.module
            self.reexport[pkg] = table
        self.defs = {m: _top_defs(t) for m, t in self.trees.items()}
        # refs[(module, def_name_or_MODULE_LEVEL)] = set of
        # (module, name | None) pairs it references; None = whole module
        self.refs: dict[tuple[str, str], set[tuple[str, str | None]]] = {}
        for m in self.modules:
            self._analyze_module(m)

    # -- import resolution ------------------------------------------------

    def _is_pkg(self, m: str) -> bool:
        return self.modules.get(m, "").endswith("__init__.py")

    def _nearest(self, dotted: str) -> str | None:
        parts = dotted.split(".")
        while parts and ".".join(parts) not in self.modules:
            parts.pop()
        return ".".join(parts) if parts else None

    def _resolve_from(self, module: str, name: str) -> tuple[str, str | None]:
        """``from <module> import <name>`` -> (defining module, name).
        name=None means the bound object IS a module."""
        m = self._nearest(module)
        if m is None:
            return module, name  # shouldn't happen; harmless
        sub = f"{m}.{name}"
        if sub in self.modules:
            return sub, None
        if self._is_pkg(m):
            target = self.reexport.get(m, {}).get(name)
            if target is not None:
                if f"{target}.{name}" in self.modules:
                    return f"{target}.{name}", None
                return target, name
            return m, None  # unresolvable through the package: taint it
        return m, name

    def _import_map(self, nodes) -> dict[str, tuple[str, str | None]]:
        """Local binding name -> (module, name|None) for import stmts."""
        out: dict[str, tuple[str, str | None]] = {}
        for node in nodes:
            if isinstance(node, ast.ImportFrom) and node.module \
                    and node.module.split(".")[0] == PKG:
                for a in node.names:
                    if a.name == "*":
                        m = self._nearest(node.module)
                        if m:
                            out[f"*{m}"] = (m, None)
                        continue
                    out[a.asname or a.name] = self._resolve_from(
                        node.module, a.name)
            elif isinstance(node, ast.Import):
                for a in node.names:
                    if a.name.split(".")[0] != PKG:
                        continue
                    m = self._nearest(a.name)
                    if m is None:
                        continue
                    out[a.asname or a.name.split(".")[0]] = (m, None)
        return out

    # -- per-module analysis ----------------------------------------------

    def _analyze_module(self, mod: str) -> None:
        tree = self.trees[mod]
        mod_imports = self._import_map(
            n for n in tree.body if isinstance(n, (ast.Import,
                                                   ast.ImportFrom)))
        local_defs = self.defs[mod]

        def collect(node: ast.AST, scope_imports) -> set:
            pairs: set[tuple[str, str | None]] = set()
            imap = dict(scope_imports)
            imap.update(self._import_map(
                n for n in ast.walk(node)
                if isinstance(n, (ast.Import, ast.ImportFrom))))
            # star imports taint their whole module
            pairs.update(v for k, v in imap.items() if k.startswith("*"))
            handled_bases: set[int] = set()
            for n in ast.walk(node):
                if isinstance(n, ast.Attribute) \
                        and isinstance(n.value, ast.Name) \
                        and n.value.id in imap:
                    # mod.attr through a module alias resolves to one
                    # def; mark the base Name handled so the Name
                    # branch below doesn't ALSO whole-module-taint it
                    handled_bases.add(id(n.value))
                    t, name = imap[n.value.id]
                    if name is None:  # module alias: mod.attr
                        pairs.add((t, n.attr))
                    else:             # attribute on an imported object
                        pairs.add((t, name))
                elif isinstance(n, ast.Name) and id(n) not in handled_bases:
                    if n.id in imap:
                        t, name = imap[n.id]
                        # bare module alias used as a value (passed
                        # around / getattr'd): whole-module taint
                        pairs.add((t, name))
                    elif n.id in local_defs:
                        pairs.add((mod, n.id))
            return pairs

        for name, node in local_defs.items():
            self.refs[(mod, name)] = collect(node, mod_imports)
        mod_level = ast.Module(
            body=[n for n in tree.body
                  if not isinstance(n, (ast.FunctionDef,
                                        ast.AsyncFunctionDef,
                                        ast.ClassDef))],
            type_ignores=[])
        self.refs[(mod, MODULE_LEVEL)] = collect(mod_level, {})

    # -- reachability -----------------------------------------------------

    def reachable(self, seeds: set) -> set:
        """Closure over (module, name) pairs; (m, None) expands to every
        def of m plus its module-level code."""
        seen: set[tuple[str, str | None]] = set()
        todo = list(seeds)
        while todo:
            pair = todo.pop()
            if pair in seen:
                continue
            seen.add(pair)
            m, name = pair
            if m not in self.modules:
                continue
            if name is None:
                todo.extend((m, d) for d in self.defs[m])
                todo.append((m, MODULE_LEVEL))
                continue
            todo.extend(self.refs.get((m, name), ()))
            if name not in self.defs[m] and name != MODULE_LEVEL:
                # module-level constant / unknown attribute
                todo.append((m, MODULE_LEVEL))
        return seen


def _registry_functions(tree: ast.Module) -> dict[str, ast.FunctionDef]:
    """@q("name")-decorated functions in a registry module AST."""
    out: dict[str, ast.FunctionDef] = {}
    for node in tree.body:
        if not isinstance(node, ast.FunctionDef):
            continue
        for dec in node.decorator_list:
            if (isinstance(dec, ast.Call)
                    and isinstance(dec.func, ast.Name)
                    and dec.func.id == "q" and dec.args
                    and isinstance(dec.args[0], ast.Constant)):
                out[dec.args[0].value] = node
    return out


def query_reach(an: _Analyzer) -> dict[str, set]:
    """Declared query -> reachable (module, def) pairs."""
    out: dict[str, set] = {}
    for reg in sorted(m for m in an.modules if ".plans.queries_" in m):
        for qname, fn in _registry_functions(an.trees[reg]).items():
            out[qname] = an.reachable({(reg, fn.name)})
    return out


def round_start_ref() -> str:
    for line in _git("log", "--format=%H %s").splitlines():
        sha, _, subject = line.partition(" ")
        if subject.startswith("round ") and ":" in subject:
            return sha
    return "HEAD"


def _strip_docstrings(tree: ast.AST) -> ast.AST:
    """Remove docstring Expr nodes in place (module/class/function
    leading string constants). Docstrings ARE AST nodes — plain
    ``ast.dump`` equality calls a docstring reword BEHAVIORAL — but
    they never affect computation, so a green attestation still covers
    the bytes (r14: a hamming_banded_pairs docstring note flagged all
    five reachers for re-attestation over zero executable change).

    ASSUMPTION (ADVICE r14 item 4): no code in the package reads
    ``__doc__`` at runtime or drives behavior from doctests — if it
    did, a docstring edit WOULD change behavior while classifying
    DOC-ONLY. ``main`` greps the package for ``__doc__`` access and
    refuses the DOC-ONLY downgrade for files that hit."""
    for node in ast.walk(tree):
        if isinstance(node, (ast.Module, ast.FunctionDef,
                             ast.AsyncFunctionDef, ast.ClassDef)):
            body = node.body
            if (body and isinstance(body[0], ast.Expr)
                    and isinstance(body[0].value, ast.Constant)
                    and isinstance(body[0].value.value, str)):
                node.body = body[1:] or [ast.Pass()]
    return tree


def classify_changes(ref: str):
    """module path -> (kind, changed def names, module_level_changed).
    kind in BEHAVIORAL | COMMENT-ONLY | DOC-ONLY | ADDED | DELETED."""
    changed = [p for p in _git(
        "diff", "--name-only", ref, "--", PKG, "__spark_entry__.py"
    ).splitlines() if p.endswith(".py")]
    out: dict[str, tuple[str, set[str], bool]] = {}
    for p in changed:
        try:
            old_src = _git("show", f"{ref}:{p}")
        except subprocess.CalledProcessError:
            out[p] = ("ADDED", set(), True)
            continue
        full = os.path.join(REPO, p)
        if not os.path.exists(full):
            out[p] = ("DELETED", set(), True)
            continue
        new_src = open(full).read()
        old_t, new_t = ast.parse(old_src), ast.parse(new_src)
        if ast.dump(old_t) == ast.dump(new_t):
            out[p] = ("COMMENT-ONLY", set(), False)
            continue
        # __doc__-introspection guard (ADVICE r14 item 4): a file that
        # reads __doc__ at runtime CAN change behavior via a docstring
        # edit, so it never earns docstring-insensitive treatment —
        # fall through to plain BEHAVIORAL per-def comparison.
        reads_doc = "__doc__" in old_src or "__doc__" in new_src
        # fresh parses: _strip_docstrings mutates, and old_t/new_t feed
        # the per-def comparison below
        if not reads_doc and \
                ast.dump(_strip_docstrings(ast.parse(old_src))) == \
                ast.dump(_strip_docstrings(ast.parse(new_src))):
            out[p] = ("DOC-ONLY", set(), False)
            continue
        # mixed files: per-def and module-level comparison is also
        # docstring-insensitive, so a def whose only change is its
        # docstring doesn't taint its reachers
        if not reads_doc:
            old_t, new_t = _strip_docstrings(old_t), _strip_docstrings(new_t)
        oldd = {n: ast.dump(d) for n, d in _top_defs(old_t).items()}
        newd = {n: ast.dump(d) for n, d in _top_defs(new_t).items()}
        def_changed = {n for n in oldd.keys() | newd.keys()
                       if oldd.get(n) != newd.get(n)}
        strip = lambda t: ast.dump(ast.Module(  # noqa: E731
            body=[n for n in t.body
                  if not isinstance(n, (ast.FunctionDef,
                                        ast.AsyncFunctionDef,
                                        ast.ClassDef))],
            type_ignores=[]))
        out[p] = ("BEHAVIORAL", def_changed, strip(old_t) != strip(new_t))
    return out


def entry_status(
    qname: str,
    declared: set[str],
    last_verified: dict[str, int],
    changed_map: dict[str, int],
) -> tuple[str, bool]:
    """Ledger verdict for one query flagged as reaching a behavioral
    change: (human-readable status, is_missing). Factored out of main()
    so the stale-entry rule is unit-testable on synthetic fixtures
    (VERDICT r18 item 2 hardening)."""
    if qname not in declared:
        return "NOT DECLARED (retired — no entry)", False
    if qname not in last_verified:
        return ("never-verified (new — no entry needed; the "
                "rotation serves it ahead of stale tiers)"), False
    entry = changed_map.get(qname)
    if entry is None:
        return "needs _CHANGED_IN_ROUND entry — MISSING", True
    if entry <= last_verified[qname]:
        return (f"needs _CHANGED_IN_ROUND entry — STALE (entry r{entry} "
                f"<= last green r{last_verified[qname]}: inert, the "
                "query never re-enters the driver window; bump the "
                "entry to the current round)"), True
    return f"needs _CHANGED_IN_ROUND entry — PRESENT (active, r{entry})", False


def main() -> None:
    ref = sys.argv[1] if len(sys.argv) > 1 else round_start_ref()
    subject = _git("log", "-1", "--format=%h %s", ref).strip()
    print(f"diff base: {subject}")
    kinds = classify_changes(ref)
    if not kinds:
        print("no physioview_spark / __spark_entry__ changes — "
              "no entries needed")
        return
    for p, (k, defs_ch, ml) in sorted(kinds.items()):
        extra = ""
        if k == "BEHAVIORAL":
            bits = sorted(defs_ch) + (["<module-level>"] if ml else [])
            extra = f"  ({', '.join(bits)})"
        print(f"  {k:12s} {p}{extra}")
    an = _Analyzer()
    path_to_mod = {v: k for k, v in an.modules.items()}
    # tainted (module, def) pairs
    tainted: set[tuple[str, str]] = set()
    behavioral = False
    for p, (k, defs_ch, ml) in kinds.items():
        if k in ("COMMENT-ONLY", "DOC-ONLY"):
            continue
        behavioral = True
        m = path_to_mod.get(p)
        if m is None:  # __spark_entry__.py or a deleted module
            continue
        if k in ("ADDED", "DELETED") or ml:
            tainted.update((m, d) for d in an.defs.get(m, {}))
            tainted.add((m, MODULE_LEVEL))
        tainted.update((m, d) for d in defs_ch)
    if not behavioral:
        print("all changes COMMENT-ONLY/DOC-ONLY (docstring-stripped "
              "AST-identical receipts above) — no _CHANGED_IN_ROUND "
              "entries needed")
        return
    sys.path.insert(0, REPO)
    import __spark_entry__ as e
    declared = set(e._registry()[0])
    last = e._last_verified()
    need = []
    for qname, reach in sorted(query_reach(an).items()):
        hits = {(m, d) for (m, d) in reach if (m, d) in tainted}
        if hits:
            need.append((qname, sorted(
                f"{m.split('.', 1)[1]}.{d}" for m, d in hits)))
    print()
    if not need:
        print("no DECLARED query reaches the behavioral changes — "
              "no _CHANGED_IN_ROUND entries needed")
    missing = []
    for qname, hits in need:
        status, bad = entry_status(qname, declared, last,
                                   e._CHANGED_IN_ROUND)
        if bad:
            missing.append(qname)
        print(f"  {qname}: {status}  [{', '.join(hits[:4])}"
              f"{', ...' if len(hits) > 4 else ''}]")
    if missing:
        print(f"\nMISSING/STALE entries for: {', '.join(missing)}")
        sys.exit(1)
    print("\nledger consistent — every flagged green query has an "
          "ACTIVE entry")


if __name__ == "__main__":
    main()
