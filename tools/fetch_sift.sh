#!/usr/bin/env bash
# Fetch the public TEXMEX SIFT1M corpus for tools/sift_parity.py.
#
# CONNECTED-MACHINE ONLY: the build container has no network (DNS
# resolution fails), so this script cannot run inside it.  Run it on
# any machine with outbound HTTP/FTP, then place the three files where
# the container can read them (e.g. /root/testdata/sift/) and run:
#
#   python3 tools/sift_parity.py \
#       --base  <dir>/sift_base.fvecs \
#       --query <dir>/sift_query.fvecs \
#       --gt    <dir>/sift_groundtruth.ivecs --nq 10000 --profiles all
#
# That one command closes SCALE.md §8c's remaining gap (real-data
# recall parity at the reference's published SIFT1M geometries).
# The smaller siftsmall corpus (10k base / 100 queries) is a quick
# smoke alternative: pass --small.
#
# Source: http://corpus-texmex.irisa.fr/  (Jégou et al., public
# benchmark corpus; ~160 MB tarball for SIFT1M, ~5 MB for siftsmall).
set -euo pipefail

DEST="${1:-./sift}"
SMALL=""
for a in "$@"; do [ "$a" = "--small" ] && SMALL=1; done

mkdir -p "$DEST"
cd "$DEST"

if [ -n "$SMALL" ]; then
    NAME=siftsmall
else
    NAME=sift
fi

URL="ftp://ftp.irisa.fr/local/texmex/corpus/${NAME}.tar.gz"
echo "fetching ${URL} -> ${DEST}/${NAME}.tar.gz"
if command -v curl >/dev/null 2>&1; then
    curl -fL -o "${NAME}.tar.gz" "$URL"
else
    wget -O "${NAME}.tar.gz" "$URL"
fi

tar xzf "${NAME}.tar.gz"
echo "done; files:"
ls -la "${NAME}"/
echo
echo "next (from the repo root, files visible to the container):"
echo "  python3 tools/sift_parity.py --base ${DEST}/${NAME}/${NAME}_base.fvecs \\"
echo "      --query ${DEST}/${NAME}/${NAME}_query.fvecs \\"
echo "      --gt ${DEST}/${NAME}/${NAME}_groundtruth.ivecs --profiles all"
