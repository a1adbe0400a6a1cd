#!/usr/bin/env python3
"""Self-evidencing leak scan (ADVICE r5 item 4): greps the repo's source
and doc surface for internal/proprietary markers and writes
LEAKCHECK_LOCAL.json carrying its own evidence — timestamp, file count,
and the exact pattern set — so each round's record shows the scan RAN
over that round's code rather than being re-stamped.

Dev-only; the library never depends on this.
"""
import json, os, re, subprocess, sys, datetime

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PATTERNS = {
    "internal-import": r"import\s+(com\.anthropic|anthropic)",
    "internal-url": r"https?://[a-z0-9.-]*\b(anthropic|claude)\b",
    "internal-pkg": r"\b(claude[-_]cli|anthropics/)\b",
    "internal-bucket": r"\b(s3|gs)://[a-z0-9._-]*(internal|anthropic|claude)",
    "slack-link": r"\b(go/[a-z]{2,}|#claude-code)",
    "api-key": r"\b(sk-ant-[A-Za-z0-9_-]{8,}|ANTHROPIC_API_KEY)\b",
    "generic-secret": r"-----BEGIN (RSA|EC|OPENSSH) PRIVATE KEY-----",
}

EXTS = (".scala", ".py", ".md", ".sbt", ".sql", ".json", ".yaml", ".yml")
SKIP_DIRS = {".git", "target", ".bloop", ".metals", ".bsp", "spark-warehouse",
             "metastore_db", "data"}
# VERDICT/ADVICE are driver-authored artifacts that NAME the scan
# patterns while reporting on them — scanning them self-triggers.
SKIP_FILES = {"LEAKCHECK.json", "LEAKCHECK_LOCAL.json", "leakscan.py",
              "VERDICT.md", "ADVICE.md"}


def scan_tree(root):
    """Walk `root` and return (n_files, hits-per-pattern-class)."""
    hits = {k: [] for k in PATTERNS}
    compiled = {k: re.compile(v, re.IGNORECASE) for k, v in PATTERNS.items()}
    n_files = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
        for fn in filenames:
            if not fn.endswith(EXTS) or fn in SKIP_FILES:
                continue
            path = os.path.join(dirpath, fn)
            n_files += 1
            try:
                text = open(path, encoding="utf-8", errors="replace").read()
            except OSError:
                continue
            for key, rx in compiled.items():
                for i, line in enumerate(text.splitlines(), 1):
                    if rx.search(line):
                        hits[key].append(f"{os.path.relpath(path, root)}:{i}")
    return n_files, hits


def selftest():
    """Negative test (r10 drill rotation): the scanner has only ever seen
    clean trees, so prove it CAN flag. Plant one file carrying a marker
    from every pattern class (strings assembled by concatenation so this
    source file itself stays clean under the real scan) plus one clean
    file, scan the staged tree, and require every class to hit exactly
    the planted file and nothing to hit the clean one."""
    import tempfile
    a = "anthro" + "pic"          # avoid self-matching the scanner source
    planted = "\n".join([
        "import com." + a + ".sdk",
        "see https://docs." + a + ".com/x",
        "from claude" + "-cli import x",
        "s3://" + a + "-internal-bucket/path",
        "go/" + "ccode and #claude" + "-code-feedback",
        "key = sk-ant-" + "abcdef1234567890",
        "-----BEGIN RSA" + " PRIVATE KEY-----",
    ])
    with tempfile.TemporaryDirectory() as td:
        with open(os.path.join(td, "planted.scala"), "w") as f:
            f.write(planted)
        with open(os.path.join(td, "clean.scala"), "w") as f:
            f.write("object Clean { val x = 1 }\n")
        n_files, hits = scan_tree(td)
        assert n_files == 2, f"expected 2 staged files, scanned {n_files}"
        missed = [k for k, v in hits.items() if not v]
        assert not missed, f"pattern classes that failed to flag: {missed}"
        wrong = [h for v in hits.values() for h in v
                 if not h.startswith("planted.scala")]
        assert not wrong, f"clean file flagged: {wrong}"
    print(f"selftest OK: all {len(PATTERNS)} pattern classes flag the "
          "planted file; the clean file stays clean")
    return 0


def main():
    n_files, hits = scan_tree(ROOT)
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                          capture_output=True, text=True).stdout.strip()
    record = {
        "scanned_at": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "git_head": head,
        "files_scanned": n_files,
        "patterns": PATTERNS,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    out = os.path.join(ROOT, "LEAKCHECK_LOCAL.json")
    json.dump(record, open(out, "w"), indent=1)
    print(f"{n_files} files, {record['n_hits']} hits -> {out}")
    return 1 if record["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(selftest() if "--selftest" in sys.argv else main())
