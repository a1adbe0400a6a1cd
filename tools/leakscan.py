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


def main():
    hits = {k: [] for k in PATTERNS}
    compiled = {k: re.compile(v, re.IGNORECASE) for k, v in PATTERNS.items()}
    n_files = 0
    for dirpath, dirnames, filenames in os.walk(ROOT):
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
                        hits[key].append(f"{os.path.relpath(path, ROOT)}:{i}")
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
    sys.exit(main())
