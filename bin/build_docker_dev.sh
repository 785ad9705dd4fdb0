#!/bin/sh
# reference: bin/build_docker_dev.sh (builds tag `spmf`)
docker build -t spmf-tpu "$(dirname "$0")/.."
