#!/bin/sh
# parity: deep_hrnet/demo/build-docker.sh
set -e
cd "$(dirname "$0")/.."
exec docker build -t udp-pose-tpu-demo -f demo/Dockerfile .
