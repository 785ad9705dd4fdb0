# Replaces reference Dockerfile:1-10 (python:3.8-slim + pip install /code).
# TPU runtime images ship jax preinstalled; this builds the CPU dev image.
FROM python:3.12-slim
COPY . /code/
RUN pip install --no-cache-dir "jax[cpu]" optax numpy scipy && \
    pip install --no-cache-dir /code/
WORKDIR /code
CMD ["python", "-m", "pytest", "tests/", "-q"]
