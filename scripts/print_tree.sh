#!/bin/sh
# Repo-layout overview (reference scripts/print_tree.sh), skipping run
# artifacts and caches.
tree "$(dirname "$0")/.." -I 'indexes|__pycache__|experiments|runs|datasets|data|.git|.pytest_cache'
