# alphadia-tpu container image (reference analog: MannLabs/alphadia Dockerfile;
# no mono/pythonnet layer — vendor raw files are converted to mzML upstream,
# the engine consumes mzML / alphaRaw-HDF / npz directly).
#
# CPU (default):
#   docker build -t alphadia-tpu .
#   docker run --rm -v $PWD/data:/data alphadia-tpu \
#       -f /data/run.mzML -l /data/library.tsv -o /data/out
#
# TPU VM: build with JAX_VARIANT="jax[tpu]" and run on a Cloud TPU VM with
# --privileged (libtpu device access):
#   docker build --build-arg JAX_VARIANT="jax[tpu]" -t alphadia-tpu:tpu .

FROM python:3.11-slim

ENV PYTHONDONTWRITEBYTECODE=1 \
    PYTHONUNBUFFERED=1

# native toolchain for the OpenMP peak-store extension (falls back to numpy
# when absent, but the container ships the fast path)
RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ libgomp1 \
    && rm -rf /var/lib/apt/lists/*

ARG UID=10001
RUN adduser --disabled-password --gecos "" --home /home/alphadia \
    --shell /sbin/nologin --uid "${UID}" alphadia

WORKDIR /app
COPY pyproject.toml ./
COPY alphadia_tpu ./alphadia_tpu

ARG JAX_VARIANT="jax"
RUN pip install --no-cache-dir "${JAX_VARIANT}" && \
    pip install --no-cache-dir .

# prebuild the native peak-store extension into site-packages while still
# root — at runtime the unprivileged user cannot write there (it would
# fall back to a ~/.cache build on first use otherwise). Portable ISA
# baseline: the image may run on a different CPU than the build machine.
RUN ALPHADIA_TPU_NATIVE_ARCH=x86-64-v2 python -c "from alphadia_tpu.native import get_lib; assert get_lib() is not None, 'native build failed'"

# build the one-file release artifact inside the image so it can be
# exported without a checkout: docker cp <ctr>:/app/dist/alphadia-tpu.pyz .
COPY scripts/build_release.py ./scripts/build_release.py
RUN python scripts/build_release.py

USER alphadia
ENTRYPOINT ["alphadia-tpu"]
CMD ["--help"]
