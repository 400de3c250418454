#!/usr/bin/env bash
# Download the VAS spectrogram features (~7 GB) from the public SpecVQGAN
# bucket, verify md5, and untar.
# Capability parity with /root/reference/data/download_vas_features.sh
# (same artifact: vas.tar.gz with features/<class>/melspec_10s_22050hz).
set -euo pipefail

cd "$(dirname "$0")"

URL="https://a3s.fi/swift/v1/AUTH_a235c0f452d648828f745589cde1219a/specvqgan_public/vas.tar.gz"
TAR="vas.tar.gz"
MD5_FILE="vas.md5"

if [ ! -f "$TAR" ]; then
  echo "Downloading $URL ..."
  curl -L -O "$URL"
fi

if [ -f "$MD5_FILE" ]; then
  echo "Verifying md5 ..."
  md5sum -c "$MD5_FILE"
else
  echo "No $MD5_FILE manifest found; skipping verification."
fi

echo "Extracting ..."
tar -xzf "$TAR"
echo "Done. Features in ./vas/features/<class>/melspec_10s_22050hz"
