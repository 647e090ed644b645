#!/bin/sh
# Install repo git hooks (the >50 MB snapshot guard) into .git/hooks.
# Idempotent; run from the repo root.
set -e
cd "$(git rev-parse --show-toplevel)"
cp tools/hooks/pre-commit .git/hooks/pre-commit
chmod +x .git/hooks/pre-commit
echo "installed .git/hooks/pre-commit (50 MB staged-file guard)"
