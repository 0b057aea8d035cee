# GuideMaker-TPU container (CPU backend; for TPU use a TPU-VM base image
# with libtpu and drop the jax[cpu] pin).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/guidemaker-tpu
COPY pyproject.toml README.md ./
COPY guidemaker_tpu ./guidemaker_tpu
RUN pip install --no-cache-dir jax numpy pandas pyyaml pytest \
    && pip install --no-cache-dir -e . \
    && make -C guidemaker_tpu/native

ENTRYPOINT ["guidemaker-tpu"]
CMD ["--help"]
