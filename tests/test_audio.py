"""WAV audio modality: lossless decode parity with synthesis-time
goldens, stereo handling, and the corrupt-blob contract."""

from pyspark.sql import Row


def test_audio_features_match_goldens_and_quarantine(spark):
    from ocr_to_csv_spark.extraction.audio import audio_features, synth_wav

    rows, expected = [], {}
    for s, (sr, ch) in enumerate([(8000, 1), (16000, 2), (22050, 1)]):
        data, exp = synth_wav(s, sr=sr, n=2000 + s * 100, channels=ch)
        rows.append(Row(media_ref=exp["media_ref"], content=bytearray(data)))
        expected[exp["media_ref"]] = exp
    # truncated body: wave header parses but PCM payload is short
    bad, bad_exp = synth_wav(99)
    rows.append(Row(media_ref="wav-bad", content=bytearray(bad[: len(bad) // 3])))
    # not a wav at all
    rows.append(Row(media_ref="not-wav", content=bytearray(b"\x00\x01gibberish")))

    df = spark.createDataFrame(rows, "media_ref string, content binary")
    got = {r["media_ref"]: r.asDict() for r in audio_features(df).collect()}

    for ref, exp in expected.items():
        for k, v in exp.items():
            assert got[ref][k] == v, (ref, k, got[ref][k], v)
    assert got["wav-bad"]["fmt"] == "corrupt_wav"
    assert got["not-wav"]["fmt"] == "corrupt_wav"
    # stereo blob decodes channel count, and duration is channel-invariant
    st = [e for e in expected.values() if e["n_channels"] == 2][0]
    assert got[st["media_ref"]]["n_channels"] == 2


def test_audio_signatures_skip_corrupt_and_match_numpy(spark):
    import numpy as np

    from ocr_to_csv_spark.extraction.audio import (
        AUDIO_SIG_BINS,
        audio_signature_np,
        audio_signatures,
        decode_pcm_ch0,
        synth_wav,
    )

    rows, want = [], {}
    for s in range(3):
        data, exp = synth_wav(s, n=1000 + 37 * s, channels=2 if s == 1 else 1)
        rows.append(Row(media_ref=exp["media_ref"], content=bytearray(data)))
        want[exp["media_ref"]] = audio_signature_np(decode_pcm_ch0(data))
    bad, _ = synth_wav(99)
    rows.append(Row(media_ref="wav-bad", content=bytearray(bad[: len(bad) // 3])))

    df = spark.createDataFrame(rows, "media_ref string, content binary")
    got = {r["media_ref"]: r["feat"] for r in audio_signatures(df).collect()}
    assert set(got) == set(want)  # corrupt blob: NO signature row
    for ref, sig in want.items():
        assert len(got[ref]) == AUDIO_SIG_BINS
        assert got[ref] == [float(x) for x in sig]
    # signature is an exact |x| partition: bins sum to total |x|
    data, exp = synth_wav(7, n=1234)
    ch0 = decode_pcm_ch0(data)
    assert audio_signature_np(ch0).sum() == np.abs(ch0).sum()
