"""Real-path tests for optionally-gated features: they RUN when the
dependency is installed and SKIP (never fail) when it is not — so a
fuller environment (Pillow, ffmpeg, delta jars) gets coverage of the
real codecs automatically while this container keeps the honest gate.
"""

import pytest
from pyspark.sql import functions as F

from lrmr_spark.optional_deps import has_delta, has_ffmpeg, has_pil


def test_probes_return_bool():
    assert isinstance(has_pil(), bool)
    assert isinstance(has_ffmpeg(), bool)
    assert isinstance(has_delta(), bool)


def test_real_paths_gate_cleanly_when_absent(spark):
    # with the dependency missing the real path must raise
    # NotImplementedError at CALL time (not mid-job on executors)
    from lrmr_spark.operators import multimodal as MM

    df = spark.range(3).select(
        F.col("id").alias("media_id"),
        F.encode(F.lit("abc"), "utf-8").alias("payload"),
    )
    if not has_pil():
        with pytest.raises(NotImplementedError):
            MM.decode_media(df, fake=False)
    if not has_ffmpeg():
        with pytest.raises(NotImplementedError):
            MM.sample_frames(df, fake=False)


@pytest.mark.skipif(not has_pil(), reason="Pillow not installed")
def test_decode_media_real_pil(spark):
    import io

    from PIL import Image

    from lrmr_spark.operators import multimodal as MM

    def png(shade: int) -> bytes:
        buf = io.BytesIO()
        Image.new("L", (4, 4), color=shade).save(buf, format="PNG")
        return buf.getvalue()

    df = spark.createDataFrame(
        [(1, png(0)), (2, png(255))], "media_id bigint, payload binary"
    )
    rows = {r["media_id"]: r for r in MM.decode_media(df, fake=False).collect()}
    assert rows[1]["feat_min"] == rows[1]["feat_max"] == 0
    assert rows[2]["feat_min"] == rows[2]["feat_max"] == 255
    assert rows[2]["feat_mean"] == 255.0


@pytest.mark.skipif(not has_ffmpeg(), reason="ffmpeg not installed")
def test_sample_frames_real_ffmpeg(spark):
    import subprocess
    import tempfile
    import os

    from lrmr_spark.operators import multimodal as MM

    # generate a tiny real clip with ffmpeg itself (8 frames of testsrc)
    with tempfile.TemporaryDirectory() as td:
        clip = os.path.join(td, "clip.mp4")
        subprocess.run(
            [
                "ffmpeg", "-v", "error", "-f", "lavfi",
                "-i", "testsrc=duration=0.4:size=64x64:rate=20",
                "-pix_fmt", "yuv420p", clip,
            ],
            check=True,
        )
        with open(clip, "rb") as f:
            payload = f.read()
    df = spark.createDataFrame([(1, payload)], "media_id bigint, payload binary")
    out = MM.sample_frames(df, max_frames=4, fake=False).collect()
    assert 1 <= len(out) <= 4
    assert all(r["frame_bytes"] > 0 and len(r["frame_md5"]) == 32 for r in out)


@pytest.mark.skipif(not has_delta(), reason="delta-spark not installed")
def test_delta_roundtrip_subprocess(tmp_path):
    # jars must be on the classpath at JVM launch, so the roundtrip runs
    # in its own python with a delta-configured session
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        f"""
        import sys; sys.path.insert(0, "/root/repo")
        from delta import configure_spark_with_delta_pip
        from pyspark.sql import SparkSession
        b = (SparkSession.builder.master("local[2]")
             .config("spark.sql.extensions",
                     "io.delta.sql.DeltaSparkSessionExtension")
             .config("spark.sql.catalog.spark_catalog",
                     "org.apache.spark.sql.catalog.DeltaCatalog"))
        spark = configure_spark_with_delta_pip(b).getOrCreate()
        spark.range(10).write.format("delta").save("{tmp_path}/t")
        from lrmr_spark.sources import read_delta
        assert read_delta(spark, "{tmp_path}/t").count() == 10
        print("DELTA_OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert "DELTA_OK" in out.stdout, out.stderr[-2000:]
