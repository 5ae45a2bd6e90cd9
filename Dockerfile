# shodh-tpu server image (reference ships an equivalent Dockerfile).
# CPU works out of the box; on TPU VMs, base off a jax[tpu] image instead.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY shodh_tpu ./shodh_tpu
COPY native ./native

RUN pip install --no-cache-dir "jax[cpu]" aiohttp msgpack numpy \
    && pip install --no-cache-dir -e . \
    && make -C native

ENV SHODH_DATA_DIR=/data
VOLUME /data
EXPOSE 8900

HEALTHCHECK --interval=30s --timeout=5s \
    CMD python -c "import urllib.request; urllib.request.urlopen('http://127.0.0.1:8900/health', timeout=3)"

CMD ["python", "-m", "shodh_tpu.cli", "serve", "--data-dir", "/data", "--host", "0.0.0.0", "--port", "8900"]
