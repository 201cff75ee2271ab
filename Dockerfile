# CPU test/development image (equivalent of the reference's
# Dockerfile.python3; TPU execution uses the standard JAX TPU images).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY pyproject.toml README.md ./
COPY safe_learning_tpu ./safe_learning_tpu
COPY tests ./tests
COPY examples ./examples
COPY scripts ./scripts
COPY Makefile bench.py ./

RUN pip install --no-cache-dir -e .[test]

CMD ["bash", "scripts/test_code.sh"]
