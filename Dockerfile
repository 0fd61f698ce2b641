# CM3P-TPU runtime image (TPU VM). The reference targets CUDA
# (torch+flash-attn, Dockerfile:1-4); this image targets Cloud TPU.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make ffmpeg && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace/cm3p_tpu
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt \
    && pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY . .
RUN make -C cm3p_tpu/native

ENTRYPOINT ["python", "train.py"]
