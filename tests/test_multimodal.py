"""Image-container synthesis + header-parse round-trip, and the
media_dimensions pipeline vs its closed-form."""

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osmgraft import multimodal
from osmgraft.multimodal import (
    parse_image_header,
    synth_dims,
    synth_image_payload,
)


@given(st.integers(min_value=0, max_value=10_000_000))
@settings(max_examples=200, deadline=None)
def test_header_roundtrip(doc_id):
    fmt, w, h = synth_dims(doc_id)
    parsed = parse_image_header(synth_image_payload(doc_id))
    assert parsed == (fmt, w, h)


def test_png_payload_is_a_valid_container():
    # fmt cycle: (doc_id // 3) % 3 == 0 -> png; doc_id=0 qualifies
    b = synth_image_payload(0)
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    # walk chunks verifying CRCs and that IDAT inflates to the raster size
    fmt, w, h = synth_dims(0)
    i, seen = 8, []
    while i < len(b):
        (ln,) = struct.unpack(">I", b[i : i + 4])
        tag = b[i + 4 : i + 8]
        body = b[i + 8 : i + 8 + ln]
        (crc,) = struct.unpack(">I", b[i + 8 + ln : i + 12 + ln])
        assert crc == zlib.crc32(tag + body) & 0xFFFFFFFF
        seen.append(tag)
        if tag == b"IDAT":
            assert len(zlib.decompress(body)) == h * (1 + 3 * w)
        i += 12 + ln
    assert seen == [b"IHDR", b"IDAT", b"IEND"]


def test_parser_rejects_garbage_without_raising():
    assert parse_image_header(b"") is None
    assert parse_image_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4) is None
    assert parse_image_header(b"\xff\xd8\xff\xd9") is None  # SOI+EOI, no SOF
    assert parse_image_header(b"not an image at all") is None
    # truncated JPEG mid-segment
    assert parse_image_header(b"\xff\xd8\xff\xc0\x00\x11\x08") is None


def test_jpeg_parser_skips_leading_segments():
    # APP1 (Exif-style) before SOF2 (progressive), dims still found
    sof2 = struct.pack(">BHH", 8, 123, 77) + bytes([1, 1, 0x11, 0])
    app1 = b"Exif\x00\x00" + b"\x00" * 10
    b = (
        b"\xff\xd8"
        + b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
        + b"\xff\xc2" + struct.pack(">H", len(sof2) + 2) + sof2
        + b"\xff\xd9"
    )
    assert parse_image_header(b) == ("jpeg", 77, 123)


@pytest.mark.usefixtures("spark")
def test_media_dimensions_matches_closed_form(spark, sf_dir):
    from osmgraft.multimodal import image_dimensions, media_images_from_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = media_images_from_documents(docs)
    got = {
        r.media_id: (r.fmt, r.width, r.height)
        for r in image_dimensions(media).collect()
    }
    want = {
        int(r.doc_id): synth_dims(int(r.doc_id))
        for r in docs.select("doc_id").collect()
        if int(r.doc_id) % 3 == 0
    }
    assert got == want and got


def test_png_pixel_decode_roundtrip_all_filters():
    """Every scanline filter type (y%5 covers 0-4) must reverse to the
    closed-form synth_pixel raster."""
    import numpy as np

    for d in [0, 9, 45, 117]:  # heights 1, 16, 28, 4 -> filters 0..4 seen
        fmt, w, h = multimodal.synth_dims(d)
        assert fmt == "png"
        px = multimodal.decode_png_pixels(multimodal.synth_image_payload(d))
        assert px is not None and px.shape == (h, w, 3)
        xs = np.arange(w).reshape(1, w, 1)
        ys = np.arange(h).reshape(h, 1, 1)
        cs = np.arange(3).reshape(1, 1, 3)
        want = (3 * xs + cs + 7 * ys + d) % 251
        assert (px == want).all()


def test_png_pixel_decode_rejects_corrupt():
    assert multimodal.decode_png_pixels(b"not a png") is None
    assert multimodal.decode_png_pixels(multimodal.synth_image_payload(3)) is None
    p = bytearray(multimodal.synth_image_payload(9))
    p[40] ^= 0xFF  # corrupt the IDAT stream
    assert multimodal.decode_png_pixels(bytes(p)) is None
    trunc = multimodal.synth_image_payload(9)[:30]
    assert multimodal.decode_png_pixels(trunc) is None


def test_jpeg_marker_walk_padding_and_bad_seglen():
    import struct

    base = multimodal.synth_image_payload(3)  # a jpeg
    fmt, w, h = multimodal.synth_dims(3)
    # 0xFF fill bytes before a marker are legal padding
    padded = base[:2] + b"\xff\xff\xff" + base[2:]
    assert multimodal.parse_image_header(padded) == ("jpeg", w, h)
    # a zero-length segment is malformed (length includes itself)
    bad = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 0) + base[2:]
    assert multimodal.parse_image_header(bad) is None


def test_decode_payload_real_png_feature():
    import numpy as np

    f = multimodal.decode_payload(multimodal.synth_image_payload(9), "image")
    assert f.shape == (8,) and abs(float(f.sum()) - 1.0) < 1e-5
    # baseline JPEG decodes for real now (r4 verdict item 6)
    fj = multimodal.decode_payload(multimodal.synth_image_payload(3), "image")
    assert fj.shape == (8,) and abs(float(fj.sum()) - 1.0) < 1e-5
    # genuinely codec-less payloads still raise (declared stub)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        multimodal.decode_payload(b"\x00\x01no-such-container", "video")


def test_wav_roundtrip_and_decode():
    import numpy as np

    for d in [1, 4, 7, 3001]:
        nch, rate, n = multimodal.synth_audio_dims(d)
        p = multimodal.synth_audio_payload(d)
        assert multimodal.parse_audio_header(p) == (nch, rate, 16, n)
        s = multimodal.decode_wav_samples(p)
        assert s is not None and s.shape == (n, nch)
        i = np.arange(n).reshape(n, 1)
        c = np.arange(nch).reshape(1, nch)
        want = (d + 31 * i + 17 * c) % 61681 - 30840
        assert (s == want).all()


def test_wav_rejects_corrupt():
    assert multimodal.parse_audio_header(b"RIFFxxxx") is None
    assert multimodal.parse_audio_header(multimodal.synth_image_payload(0)) is None
    p = bytearray(multimodal.synth_audio_payload(1))
    p[20] = 2  # audio_fmt != PCM
    assert multimodal.parse_audio_header(bytes(p)) is None
    trunc = multimodal.synth_audio_payload(7)[:30]
    assert multimodal.decode_wav_samples(trunc) is None


def test_decode_payload_real_wav_feature():
    f = multimodal.decode_payload(multimodal.synth_audio_payload(4), "audio")
    assert f.shape == (8,) and abs(float(f.sum()) - 1.0) < 1e-5


def test_gif_lzw_roundtrip_and_decode():
    import numpy as np

    for d in [6, 15, 24, 33, 96]:  # doc_id % 9 == 6 -> gif
        fmt, w, h = multimodal.synth_dims(d)
        assert fmt == "gif"
        px = multimodal.decode_gif_pixels(multimodal.synth_image_payload(d))
        assert px is not None and px.shape == (h, w, 3)
        xs = np.arange(w).reshape(1, w)
        ys = np.arange(h).reshape(h, 1)
        idx = (xs + 2 * ys + d) % 4
        pal = np.array(
            [[multimodal.gif_palette(i, c) for c in range(3)] for i in range(4)]
        )
        assert (px == pal[idx]).all()


def test_gif_lzw_stress_reset_path():
    import numpy as np

    rng = np.random.RandomState(7)
    # 8-bit stream long enough to grow to 12-bit codes and reset
    s = rng.randint(0, 256, size=60000).astype(np.uint8)
    dec = multimodal._gif_lzw_decode(multimodal._gif_lzw_encode(s, 8), 8)
    assert bytes(dec) == s.tobytes()


def test_gif_rejects_corrupt():
    assert multimodal.decode_gif_pixels(b"GIF89a" + b"x" * 10) is None
    assert multimodal.decode_gif_pixels(multimodal.synth_image_payload(0)) is None
    trunc = multimodal.synth_image_payload(6)[:15]
    assert multimodal.decode_gif_pixels(trunc) is None


def test_decode_payload_real_gif_feature():
    f = multimodal.decode_payload(multimodal.synth_image_payload(6), "image")
    assert f.shape == (8,) and abs(float(f.sum()) - 1.0) < 1e-5


def test_video_frames_roundtrip():
    import numpy as np

    for d in [2, 5, 11]:
        w, h, nf = multimodal.synth_video_dims(d)
        frames = multimodal.decode_gif_frames(multimodal.synth_video_payload(d))
        assert frames is not None and len(frames) == nf
        pal = np.array(
            [[multimodal.gif_palette(i, c) for c in range(3)] for i in range(4)]
        )
        xs = np.arange(w).reshape(1, w)
        ys = np.arange(h).reshape(h, 1)
        for f in range(nf):
            assert (frames[f] == pal[(xs + 2 * ys + d + 5 * f) % 4]).all()


def test_resize_nearest_kernel():
    import numpy as np

    px = multimodal.decode_png_pixels(multimodal.synth_image_payload(9))
    th = multimodal.resize_nearest(px, 8, 8)
    _, w, h = multimodal.synth_dims(9)
    want = np.array(
        [[[multimodal.synth_pixel(9, (x * w) // 8, (y * h) // 8, c)
           for c in range(3)] for x in range(8)] for y in range(8)]
    )
    assert th.shape == (8, 8, 3) and (th == want).all()
    # upscale path: 1x1 -> 4x4 replicates the single pixel
    one = multimodal.decode_png_pixels(multimodal.synth_image_payload(0))
    up = multimodal.resize_nearest(one, 4, 4)
    assert up.shape == (4, 4, 3) and (up == one[0, 0]).all()


@given(st.lists(st.integers(min_value=0, max_value=255), max_size=400))
@settings(max_examples=60, deadline=None)
def test_lzw_roundtrip_property(vals):
    """Property: LZW decode(encode(s)) == s for any byte stream."""
    import numpy as np

    s = np.array(vals, dtype=np.uint8)
    dec = multimodal._gif_lzw_decode(multimodal._gif_lzw_encode(s, 8), 8)
    assert bytes(dec) == s.tobytes()


@given(st.integers(min_value=0, max_value=10_000_000))
@settings(max_examples=40, deadline=None)
def test_video_payload_frame_count_property(doc_id):
    """Property: any synthetic video payload decodes to exactly its
    closed-form frame count with closed-form dimensions."""
    w, h, nf = multimodal.synth_video_dims(doc_id)
    frames = multimodal.decode_gif_frames(multimodal.synth_video_payload(doc_id))
    assert frames is not None and len(frames) == nf
    assert all(f.shape == (h, w, 3) for f in frames)


def _jpeg_plane(doc_id, coeff_fn, q0, q2, q5):
    """Independent numpy evaluation of one decoded plane's closed form
    (the same arithmetic the DuckDB oracle runs)."""
    import numpy as np

    _, w, h = multimodal.synth_dims(doc_id)
    K1 = [1004, 851, 569, 200, -200, -569, -851, -1004]
    K2 = [946, 392, -392, -946, -946, -392, 392, 946]
    out = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            dc, a2, a5 = coeff_fn(doc_id, x // 8, y // 8)
            s = (
                dc * q0 * 724 * 724
                + a2 * q2 * 724 * K1[y % 8]
                + a5 * q5 * 724 * K2[x % 8]
            )
            out[y, x] = min(255, max(0, 128 + ((s + (1 << 21)) >> 22)))
    return out


def _jpeg_closed_form(doc_id):
    """Closed-form decoded raster: luma plane for grayscale docs; the
    integer JFIF color transform of the three planes for color docs
    (4:2:0 docs evaluate chroma at half resolution and replicate)."""
    import numpy as np

    yv = _jpeg_plane(doc_id, multimodal.synth_jpeg_coeffs, 64, 10, 12)
    if not multimodal.synth_jpeg_is_color(doc_id):
        return yv
    _, w, h = multimodal.synth_dims(doc_id)
    cw, chh = ((w + 1) // 2, (h + 1) // 2) if \
        multimodal.synth_jpeg_is_subsampled(doc_id) else (w, h)
    cb = _jpeg_plane_wh(
        doc_id, cw, chh,
        lambda d, bx, by: multimodal.synth_jpeg_chroma_coeffs(d, bx, by)[0],
        40, 8, 10,
    )
    cr = _jpeg_plane_wh(
        doc_id, cw, chh,
        lambda d, bx, by: multimodal.synth_jpeg_chroma_coeffs(d, bx, by)[1],
        40, 8, 10,
    )
    if multimodal.synth_jpeg_is_subsampled(doc_id):
        cb = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)[:h, :w]
        cr = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)[:h, :w]
    return multimodal._ycbcr_to_rgb(yv, cb, cr)


def test_jpeg_entropy_decode_roundtrip_exact():
    # full pipeline: coefficient closed form -> Huffman encode (DC
    # prediction, AC run-length, EOB) -> marker stream -> general
    # decoder (DHT rebuild, bit reader, dequant, integer IDCT, and for
    # the color tier per-component quant/Huffman selection + integer
    # YCbCr->RGB) must be BIT-EXACT against the closed form, including
    # 0/255 clamping
    import numpy as np

    clamped = 0
    saw_color = saw_gray = False
    for doc_id in (3, 12, 21, 30, 57, 102, 300):
        px = multimodal.decode_jpeg_pixels(multimodal.synth_jpeg_payload(doc_id))
        cf = _jpeg_closed_form(doc_id)
        assert px is not None and px.shape == cf.shape
        assert np.array_equal(px, cf), doc_id
        clamped += int((px == 0).sum() + (px == 255).sum())
        if multimodal.synth_jpeg_is_color(doc_id):
            saw_color = True
            assert px.ndim == 3 and px.shape[2] == 3
        else:
            saw_gray = True
            assert px.ndim == 2
    assert saw_color and saw_gray  # both scan structures exercised
    assert clamped > 0  # the DC range is sized to exercise the clamp


def test_jpeg_color_tables_are_load_bearing():
    # the chroma components declare quant table 1 and Huffman tables
    # DC1/AC1 (different values AND different code lengths than set 0);
    # decoding a color payload as if chroma used set 0 must NOT work —
    # i.e. per-component table selection is semantics, not decoration
    import numpy as np

    doc_id = 12
    assert multimodal.synth_jpeg_is_color(doc_id)
    p = bytearray(multimodal.synth_jpeg_payload(doc_id))
    sos = p.find(b"\xff\xda")
    # SOS body: ns=3, (1, 0x00), (2, 0x11), (3, 0x11), spectral bytes
    assert sos > 0 and p[sos + 4] == 3 and p[sos + 6] == 0x00
    assert p[sos + 8] == 0x11 and p[sos + 10] == 0x11
    p[sos + 8] = 0x00  # Cb scan spec -> DC0/AC0
    p[sos + 10] = 0x00  # Cr scan spec -> DC0/AC0
    wrong = multimodal.decode_jpeg_pixels(bytes(p))
    right = multimodal.decode_jpeg_pixels(
        multimodal.synth_jpeg_payload(doc_id)
    )
    assert wrong is None or not np.array_equal(wrong, right)


def test_jpeg_byte_stuffing_roundtrip():
    # the synthetic coefficient range never emits an 0xFF scan byte, so
    # exercise stuffing directly: a handcrafted one-block scan whose DC
    # value bits are all ones forces 0xFF bytes into the stream; the
    # encoder must stuff 0x00 and the decoder must unstuff it
    import struct as _s

    import numpy as np

    M = multimodal
    dc_code = M._huff_canonical(M._JPEG_DC_BITS, M._JPEG_DC_VALS)
    ac_code = M._huff_canonical(M._JPEG_AC_BITS, M._JPEG_AC_VALS)
    # writer/reader stuffing contract first, in isolation
    w16 = M._MsbBitWriter()
    w16.write(0xFFFF, 16)
    assert w16.finish() == b"\xff\x00\xff\x00"
    r = M._MsbBitReader(b"\xff\x00\xff\x00", 0)
    assert r.read(16) == 0xFFFF

    # then through the full decoder: two blocks — block 1 spends 12
    # zero bits (DC cat 0 + EOB), so block 2's 11 all-ones DC value
    # bits land byte-aligned and force a stuffed 0xFF into the scan
    bw = M._MsbBitWriter()
    c, ln = dc_code[0]
    bw.write(c, ln)
    c, ln = ac_code[0x00]
    bw.write(c, ln)
    c, ln = dc_code[11]
    bw.write(c, ln)
    bw.write(2047, 11)  # diff +2047: bits 11111111111
    c, ln = ac_code[0x00]
    bw.write(c, ln)
    scan = bw.finish()
    assert b"\xff\x00" in scan  # stuffing engaged

    def seg(marker, body):
        return bytes([0xFF, marker]) + _s.pack(">H", len(body) + 2) + body

    payload = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes(M._JPEG_QTAB))
        + seg(0xC4, bytes([0x00]) + bytes(M._JPEG_DC_BITS) + bytes(M._JPEG_DC_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(M._JPEG_AC_BITS) + bytes(M._JPEG_AC_VALS))
        + seg(0xC0, _s.pack(">BHH", 8, 8, 16) + bytes([1, 1, 0x11, 0]))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + scan
        + b"\xff\xd9"
    )
    px = M.decode_jpeg_pixels(payload)
    assert px is not None and px.shape == (8, 16)
    # block 1: DC 0 -> flat 128; block 2: DC 2047 -> clamped flat 255
    assert np.unique(px[:, :8]).tolist() == [128]
    assert np.unique(px[:, 8:]).tolist() == [255]


def test_jpeg_restart_markers_roundtrip_and_are_load_bearing():
    # restart docs (synth_jpeg_restart_interval) carry DRI + real RSTn
    # boundaries: byte-aligned padding, RST0..7 modulo sequence,
    # DC-predictor resets.  Restarts restructure the bitstream without
    # changing any pixel, so the closed form is the same oracle.
    import numpy as np

    M = multimodal
    rst_doc = None
    for doc_id in (21, 48, 75, 102, 129, 156, 183):
        assert M.synth_jpeg_restart_interval(doc_id) == 2
        p = M.synth_jpeg_payload(doc_id)
        assert b"\xff\xdd" in p  # DRI present
        px = M.decode_jpeg_pixels(p)
        cf = _jpeg_closed_form(doc_id)
        assert px is not None and np.array_equal(px, cf), doc_id
        n_rst = sum(p.count(bytes([0xFF, 0xD0 + m])) for m in range(8))
        if rst_doc is None and n_rst > 8:
            rst_doc = (doc_id, p)  # modulo wraparound exercised
    assert rst_doc is not None
    doc_id, p = rst_doc
    # strip the DRI segment: the decoder must NOT silently skip the
    # RSTn markers it no longer expects (the pre-round-5 reader did)
    i = p.find(b"\xff\xdd")
    assert M.decode_jpeg_pixels(p[:i] + p[i + 6 :]) is None
    # corrupt the modulo sequence: RST0 -> RST3 must fail loudly
    j = p.find(b"\xff\xd0")
    mut = bytearray(p)
    mut[j + 1] = 0xD3
    assert M.decode_jpeg_pixels(bytes(mut)) is None
    # drop one restart marker entirely: the stream desynchronizes and
    # the decode must fail, not return wrong pixels
    assert M.decode_jpeg_pixels(p[:j] + p[j + 2 :]) is None


def test_jpeg_decoder_rejects_corrupt_and_foreign():
    p = multimodal.synth_jpeg_payload(12)
    assert multimodal.decode_jpeg_pixels(p[:40]) is None  # truncated scan
    assert multimodal.decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None
    assert multimodal.decode_jpeg_pixels(multimodal.synth_image_payload(0)) is None
    # SOF claiming 3 components over a 1-component body: the component
    # specs are missing (truncated SOF) -> None, not a crash
    mut = bytearray(multimodal.synth_jpeg_payload(3))  # grayscale doc
    sof = mut.find(b"\xff\xc0")
    mut[sof + 9] = 3
    assert multimodal.decode_jpeg_pixels(bytes(mut)) is None
    # flipping a 1x1 color doc's declared Y sampling to 2x2 makes the
    # MCU structure disagree with the entropy stream: the decoder must
    # NOT return the true raster
    import numpy as np

    cp = bytearray(multimodal.synth_jpeg_payload(12))
    sof = cp.find(b"\xff\xc0")
    assert cp[sof + 11] == 0x11
    cp[sof + 11] = 0x22
    wrong = multimodal.decode_jpeg_pixels(bytes(cp))
    right = multimodal.decode_jpeg_pixels(multimodal.synth_jpeg_payload(12))
    assert wrong is None or not np.array_equal(wrong, right)


def test_jpeg_payload_parses_with_stdlib_header_walk():
    # the header parser (marker walk) must coexist with the entropy
    # scan: dims come from SOF0 behind DQT/DHT segments
    for doc_id in (3, 12, 21):
        fmt, w, h = multimodal.synth_dims(doc_id)
        assert multimodal.parse_image_header(
            multimodal.synth_jpeg_payload(doc_id)
        ) == ("jpeg", w, h)


def _jpeg_plane_wh(ident, w, h, coeff_fn, q0, q2, q5):
    """_jpeg_plane with explicit dimensions (MJPEG frames take their
    size from the video closed form, not synth_dims)."""
    import numpy as np

    K1 = [1004, 851, 569, 200, -200, -569, -851, -1004]
    K2 = [946, 392, -392, -946, -946, -392, 392, 946]
    out = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            dc, a2, a5 = coeff_fn(ident, x // 8, y // 8)
            s = (
                dc * q0 * 724 * 724
                + a2 * q2 * 724 * K1[y % 8]
                + a5 * q5 * 724 * K2[x % 8]
            )
            out[y, x] = min(255, max(0, 128 + ((s + (1 << 21)) >> 22)))
    return out


def _mjpeg_closed_form_frame(doc_id, f):
    import numpy as np

    w, h, _ = multimodal.synth_video_dims(doc_id)
    ident = doc_id + 97 * f
    yv = _jpeg_plane_wh(ident, w, h, multimodal.synth_jpeg_coeffs, 64, 10, 12)
    if not multimodal.synth_mjpeg_is_color(doc_id):
        return yv
    sub = multimodal.synth_mjpeg_is_subsampled(doc_id)
    cw, chh = ((w + 1) // 2, (h + 1) // 2) if sub else (w, h)
    cb = _jpeg_plane_wh(
        ident, cw, chh,
        lambda d, bx, by: multimodal.synth_jpeg_chroma_coeffs(d, bx, by)[0],
        40, 8, 10,
    )
    cr = _jpeg_plane_wh(
        ident, cw, chh,
        lambda d, bx, by: multimodal.synth_jpeg_chroma_coeffs(d, bx, by)[1],
        40, 8, 10,
    )
    if sub:
        cb = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)[:h, :w]
        cr = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)[:h, :w]
    return multimodal._ycbcr_to_rgb(yv, cb, cr)


def test_mjpeg_avi_roundtrip_exact():
    # RIFF AVI container walk + per-frame baseline-JPEG entropy decode
    # must be BIT-EXACT against the coefficient-space closed form for
    # every frame — gray and color docs, restart and no-restart docs
    import numpy as np

    saw_color = saw_gray = saw_rst = saw_sub = False
    for doc_id in (5, 11, 17, 23, 29, 35, 47, 305, 1001):
        if doc_id % 3 != 2 or not multimodal.synth_video_is_mjpeg(doc_id):
            continue
        w, h, nf = multimodal.synth_video_dims(doc_id)
        frames = multimodal.decode_avi_frames(
            multimodal.synth_mjpeg_payload(doc_id)
        )
        assert frames is not None and len(frames) == nf
        for f, fr in enumerate(frames):
            cf = _mjpeg_closed_form_frame(doc_id, f)
            assert fr.shape == cf.shape
            assert np.array_equal(fr, cf), (doc_id, f)
        if multimodal.synth_mjpeg_is_color(doc_id):
            saw_color = True
        else:
            saw_gray = True
        if multimodal.synth_mjpeg_restart_interval(doc_id):
            saw_rst = True
        if multimodal.synth_mjpeg_is_subsampled(doc_id):
            saw_sub = True
    # all four frame layouts exercised: gray, 1x1 color, 4:2:0 color,
    # restart-interval docs
    assert saw_color and saw_gray and saw_rst and saw_sub


def test_avi_parser_strictness():
    # malformed containers are a loud None, never a partial decode
    import struct as _s

    p = multimodal.synth_mjpeg_payload(5)
    assert multimodal.parse_avi(p) is not None
    assert multimodal.parse_avi(p[:-5]) is None          # truncated tail
    assert multimodal.parse_avi(p[:40]) is None          # truncated header
    assert multimodal.parse_avi(b"RIFF\x04\x00\x00\x00AVI ") is None
    # non-MJPG stream (strf biCompression) must be rejected
    i = p.find(b"MJPG", p.find(b"strf"))
    mut = bytearray(p)
    mut[i:i + 4] = b"XVID"
    assert multimodal.parse_avi(bytes(mut)) is None
    # avih frame count disagreeing with the movi chunks must be rejected
    j = p.find(b"avih") + 8 + 16
    mut = bytearray(p)
    mut[j] ^= 1
    assert multimodal.parse_avi(bytes(mut)) is None
    # an animated GIF is not an AVI
    assert multimodal.decode_avi_frames(multimodal.synth_video_payload(2)) is None
    # a frame whose decoded raster disagrees with the container dims is
    # rejected: bump the first frame's SOF0 height 2 -> 8 (same MCU
    # grid, so the JPEG itself still decodes — to the wrong shape)
    w5, h5, _ = multimodal.synth_video_dims(5)
    assert h5 == 2
    k = p.find(b"\xff\xc0", p.find(b"00dc"))
    assert _s.unpack(">H", p[k + 5:k + 7])[0] == h5
    mut = bytearray(p)
    mut[k + 5:k + 7] = _s.pack(">H", 8)
    assert multimodal.parse_avi(bytes(mut)) is not None
    assert multimodal.decode_avi_frames(bytes(mut)) is None


def test_video_population_alternates_containers():
    # successive video docs alternate GIF / MJPEG-AVI, and BOTH real
    # decode paths feed frame_sample_stats through the same schema
    gif_doc, avi_doc = 2, 5
    assert not multimodal.synth_video_is_mjpeg(gif_doc)
    assert multimodal.synth_video_is_mjpeg(avi_doc)
    assert multimodal.decode_gif_frames(
        multimodal.synth_video_payload(gif_doc)
    ) is not None
    assert multimodal.decode_avi_frames(
        multimodal.synth_mjpeg_payload(avi_doc)
    ) is not None


def _adpcm_ref_reconstruct(doc_id):
    """Independent reference: replay the IMA encoder recurrence over
    the closed-form input (the same arithmetic the DuckDB oracle runs
    in its recursive CTE)."""
    import numpy as np

    nch, _, n = multimodal.synth_audio_dims(doc_id)
    out = np.empty((n, nch), dtype=np.int64)
    for ch in range(nch):
        pred = multimodal.synth_sample(doc_id, 0, ch)
        sidx = multimodal.synth_adpcm_step_index(doc_id, ch)
        out[0, ch] = pred
        for i in range(1, n):
            step = multimodal._IMA_STEP_TABLE[sidx]
            diff = multimodal.synth_sample(doc_id, i, ch) - pred
            sign = diff < 0
            delta, diffq = multimodal._ima_quantize(
                -diff if sign else diff, step
            )
            pred = max(-32768, min(32767, pred + (-diffq if sign else diffq)))
            sidx = max(0, min(88, sidx + multimodal._IMA_INDEX_TABLE[delta]))
            out[i, ch] = pred
    return out


def test_adpcm_roundtrip_exact():
    # encode (quantize + nibble pack + container) -> decode (chunk
    # walk + step-table recurrence) must be BIT-EXACT against the
    # independent recurrence replay, mono and stereo — and genuinely
    # LOSSY vs the original samples (it is a real compressed codec,
    # not a pass-through)
    import numpy as np

    saw_mono = saw_stereo = False
    any_lossy = False
    # 3-way codec split: ADPCM docs are (doc_id // 6) % 3 == 1
    for doc_id in (7, 10, 25, 28, 43, 46, 64, 1015):
        assert doc_id % 3 == 1 and multimodal.synth_audio_is_adpcm(doc_id)
        s = multimodal.decode_adpcm_samples(
            multimodal.synth_adpcm_payload(doc_id)
        )
        ref = _adpcm_ref_reconstruct(doc_id)
        assert s is not None and s.shape == ref.shape
        assert np.array_equal(s, ref), doc_id
        nch, _, n = multimodal.synth_audio_dims(doc_id)
        orig = np.array(
            [[multimodal.synth_sample(doc_id, i, ch) for ch in range(nch)]
             for i in range(n)]
        )
        any_lossy = any_lossy or not np.array_equal(s, orig)
        saw_mono = saw_mono or nch == 1
        saw_stereo = saw_stereo or nch == 2
    assert saw_mono and saw_stereo and any_lossy


def test_adpcm_parser_strictness():
    import struct as _s

    p = multimodal.synth_adpcm_payload(7)
    assert multimodal.decode_adpcm_samples(p) is not None
    assert multimodal.decode_adpcm_samples(p[:-3]) is None   # truncated
    # a PCM WAV is not ADPCM, and vice versa
    assert multimodal.decode_adpcm_samples(multimodal.synth_audio_payload(1)) is None
    assert multimodal.decode_wav_samples(p) is None
    # the fact chunk (sample count) is mandatory for compressed WAVs
    i = p.find(b"fact")
    nofact = p[:i] + p[i + 12:]
    nofact = nofact[:4] + _s.pack("<I", len(nofact) - 8) + nofact[8:]
    assert multimodal.decode_adpcm_samples(nofact) is None
    # wSamplesPerBlock inconsistent with nBlockAlign is rejected
    mut = bytearray(p)
    j = p.find(b"fmt ") + 26  # wSamplesPerBlock
    mut[j:j + 2] = _s.pack("<H", _s.unpack("<H", p[j:j + 2])[0] + 1)
    assert multimodal.decode_adpcm_samples(bytes(mut)) is None
    # a block header step index > 88 is rejected
    mut = bytearray(p)
    k = p.find(b"data") + 8 + 2  # first channel header: pred(2) sidx(1)
    mut[k] = 89
    assert multimodal.decode_adpcm_samples(bytes(mut)) is None


def test_audio_population_alternates_codecs():
    # audio docs rotate PCM16 / IMA-ADPCM / G.711 mu-law and all three
    # feed wav_sample_stats through the same schema
    assert multimodal.synth_audio_codec(1) == "pcm"
    assert multimodal.synth_audio_codec(7) == "adpcm"
    assert multimodal.synth_audio_codec(13) == "ulaw"
    assert multimodal.decode_wav_samples(
        multimodal.synth_audio_payload(1)
    ) is not None
    assert multimodal.decode_adpcm_samples(
        multimodal.synth_adpcm_payload(7)
    ) is not None
    assert multimodal.decode_ulaw_samples(
        multimodal.synth_ulaw_payload(13)
    ) is not None
    assert multimodal.synth_audio_codec(31) == "alaw"
    assert multimodal.decode_alaw_samples(
        multimodal.synth_alaw_payload(31)
    ) is not None
    # all eight codec x channel-count combinations occur
    combos = set()
    for d in range(1, 400, 3):
        nch, _, _ = multimodal.synth_audio_dims(d)
        combos.add((multimodal.synth_audio_codec(d), nch))
    assert combos == {
        ("pcm", 1), ("pcm", 2), ("adpcm", 1), ("adpcm", 2),
        ("ulaw", 1), ("ulaw", 2), ("alaw", 1), ("alaw", 2),
    }


def test_ulaw_roundtrip_exact_and_lossy():
    # container decode must equal the direct companding of the
    # closed-form samples; the codec is genuinely lossy; the decode
    # extremes match the canonical G.711 table (+-32124)
    import numpy as np

    assert multimodal.ulaw_decode(multimodal.ulaw_encode(32767)) == 32124
    assert multimodal.ulaw_decode(multimodal.ulaw_encode(-32768)) == -32124
    lossy = False
    for doc_id in (13, 16, 49, 52, 85, 88):
        assert multimodal.synth_audio_codec(doc_id) == "ulaw"
        nch, _, n = multimodal.synth_audio_dims(doc_id)
        s = multimodal.decode_ulaw_samples(multimodal.synth_ulaw_payload(doc_id))
        assert s is not None and s.shape == (n, nch)
        want = np.array([
            [multimodal.ulaw_decode(multimodal.ulaw_encode(
                multimodal.synth_sample(doc_id, i, ch)))
             for ch in range(nch)] for i in range(n)
        ])
        assert np.array_equal(s, want), doc_id
        orig = np.array([
            [multimodal.synth_sample(doc_id, i, ch) for ch in range(nch)]
            for i in range(n)
        ])
        lossy = lossy or not np.array_equal(s, orig)
    assert lossy


def test_ulaw_parser_strictness():
    import struct as _s

    p = multimodal.synth_ulaw_payload(13)
    assert multimodal.decode_ulaw_samples(p[:-3]) is None       # truncated
    assert multimodal.decode_ulaw_samples(
        multimodal.synth_audio_payload(1)) is None              # PCM != ulaw
    assert multimodal.decode_wav_samples(p) is None             # and vice versa
    # fact chunk is mandatory
    i = p.find(b"fact")
    nofact = p[:i] + p[i + 12:]
    nofact = nofact[:4] + _s.pack("<I", len(nofact) - 8) + nofact[8:]
    assert multimodal.decode_ulaw_samples(nofact) is None
    # fact disagreeing with the data length is rejected
    mut = bytearray(p)
    mut[i + 8] ^= 1
    assert multimodal.decode_ulaw_samples(bytes(mut)) is None


def test_jpeg_420_subsampling_roundtrip_exact():
    # 4:2:0 docs: Y sampling 2x2 (4 luma blocks per MCU), chroma coded
    # at half resolution and upsampled by pixel replication — decode
    # must be BIT-EXACT against the closed form with chroma evaluated
    # at (x//2, y//2), including the restart-interval combination
    import numpy as np

    saw_rst = False
    for doc_id in (30, 66, 102, 138, 174):
        assert multimodal.synth_jpeg_is_subsampled(doc_id)
        _, w, h = multimodal.synth_dims(doc_id)
        px = multimodal.decode_jpeg_pixels(multimodal.synth_jpeg_payload(doc_id))
        yv = _jpeg_plane(doc_id, multimodal.synth_jpeg_coeffs, 64, 10, 12)
        wh, hh = (w + 1) // 2, (h + 1) // 2
        cbh = _jpeg_plane_wh(
            doc_id, wh, hh,
            lambda d, bx, by: multimodal.synth_jpeg_chroma_coeffs(d, bx, by)[0],
            40, 8, 10,
        )
        crh = _jpeg_plane_wh(
            doc_id, wh, hh,
            lambda d, bx, by: multimodal.synth_jpeg_chroma_coeffs(d, bx, by)[1],
            40, 8, 10,
        )
        cb = np.repeat(np.repeat(cbh, 2, axis=0), 2, axis=1)[:h, :w]
        cr = np.repeat(np.repeat(crh, 2, axis=0), 2, axis=1)[:h, :w]
        cf = multimodal._ycbcr_to_rgb(yv, cb, cr)
        assert px is not None and px.shape == cf.shape
        assert np.array_equal(px, cf), doc_id
        saw_rst = saw_rst or multimodal.synth_jpeg_restart_interval(doc_id) > 0
    assert saw_rst  # at least one 4:2:0 doc also carries DRI/RSTn


def test_jpeg_sampling_factors_are_load_bearing():
    # flipping the SOF Y-sampling byte of a 4:2:0 file to 1x1 changes
    # the declared MCU structure out from under the entropy stream:
    # the decoder must NOT return the true raster (loud None, or a
    # raster that provably differs)
    import numpy as np

    doc_id = 30
    p = multimodal.synth_jpeg_payload(doc_id)
    sof = p.find(b"\xff\xc0")
    # SOF0: ff c0 len(2) prec(1) h(2) w(2) ncomp(1) then (id, samp, q)*
    assert p[sof + 9] == 3 and p[sof + 11] == 0x22
    mut = bytearray(p)
    mut[sof + 11] = 0x11
    wrong = multimodal.decode_jpeg_pixels(bytes(mut))
    right = multimodal.decode_jpeg_pixels(p)
    assert wrong is None or not np.array_equal(wrong, right)
    # invalid sampling factor values are rejected outright
    mut = bytearray(p)
    mut[sof + 11] = 0x02  # h=0
    assert multimodal.decode_jpeg_pixels(bytes(mut)) is None
    # a non-integer upsampling ratio (hmax=3, chroma h=2) is rejected
    mut = bytearray(p)
    mut[sof + 11] = 0x32
    mut[sof + 14] = 0x21  # Cb
    assert multimodal.decode_jpeg_pixels(bytes(mut)) is None


def test_jpeg_color_population_alternates_sampling():
    # color stills alternate 1x1 / 4:2:0; grayscale docs are never
    # flagged subsampled
    subs = [d for d in range(3, 400, 9) if multimodal.synth_jpeg_is_subsampled(d)]
    full = [
        d for d in range(3, 400, 9)
        if multimodal.synth_jpeg_is_color(d)
        and not multimodal.synth_jpeg_is_subsampled(d)
    ]
    assert subs and full
    assert all(multimodal.synth_jpeg_is_color(d) for d in subs)
    gray = [d for d in range(3, 400, 9) if not multimodal.synth_jpeg_is_color(d)]
    assert not any(multimodal.synth_jpeg_is_subsampled(d) for d in gray)


def test_jpeg_progressive_roundtrip_exact():
    # progressive (SOF2, spectral selection) restructures the entropy
    # stream only: decoded pixels must be BIT-EXACT against both the
    # closed form and the baseline encoding of the same coefficients,
    # across gray/color, 1x1/4:2:0 and restart-interval combos
    import numpy as np

    combos = set()
    for doc_id in (39, 84, 129, 174, 219, 264, 309, 354):
        assert multimodal.synth_jpeg_is_progressive(doc_id)
        p = multimodal.synth_jpeg_payload(doc_id)
        assert b"\xff\xc2" in p and b"\xff\xc0" not in p.split(b"\xff\xda")[0]
        px = multimodal.decode_jpeg_pixels(p)
        cf = _jpeg_closed_form(doc_id)
        assert px is not None and px.shape == cf.shape
        assert np.array_equal(px, cf), doc_id
        base = multimodal._jpeg_encode_image(
            doc_id, *multimodal.synth_dims(doc_id)[1:],
            multimodal.synth_jpeg_is_color(doc_id),
            multimodal.synth_jpeg_restart_interval(doc_id),
            multimodal.synth_jpeg_is_subsampled(doc_id), False,
        )
        assert np.array_equal(px, multimodal.decode_jpeg_pixels(base))
        combos.add((
            multimodal.synth_jpeg_is_color(doc_id),
            multimodal.synth_jpeg_is_subsampled(doc_id),
            multimodal.synth_jpeg_restart_interval(doc_id) > 0,
        ))
    assert len(combos) >= 4  # several scan-structure combos exercised


def test_jpeg_progressive_strictness():
    import struct as _s

    p = multimodal.synth_jpeg_payload(39)  # gray progressive
    assert multimodal.decode_jpeg_pixels(p) is not None
    # truncation anywhere (mid-scan or before EOI) is a loud None
    assert multimodal.decode_jpeg_pixels(p[:-2]) is None
    assert multimodal.decode_jpeg_pixels(p[:360]) is None
    # successive approximation is supported now — but a declared Al
    # on a stream encoded at full precision must NOT yield the true
    # raster (the point transform rescales every DC)
    import numpy as np

    right = multimodal.decode_jpeg_pixels(p)
    mut = bytearray(p)
    sos = mut.find(b"\xff\xda")
    ln = _s.unpack(">H", mut[sos + 2:sos + 4])[0]
    mut[sos + 2 + ln - 1] = 0x01  # AhAl of the first (DC) scan
    wrong = multimodal.decode_jpeg_pixels(bytes(mut))
    assert wrong is None or not np.array_equal(wrong, right)
    # an inconsistent refinement (Al != Ah - 1) is rejected outright
    mut = bytearray(p)
    mut[sos + 2 + ln - 1] = 0x31
    assert multimodal.decode_jpeg_pixels(bytes(mut)) is None
    # an AC scan claiming Se > 63 is rejected
    mut = bytearray(p)
    sos2 = mut.find(b"\xff\xda", sos + 2)
    ln2 = _s.unpack(">H", mut[sos2 + 2:sos2 + 4])[0]
    assert mut[sos2 + 2 + ln2 - 2] == 4  # Se of the (1, 4) band scan
    mut[sos2 + 2 + ln2 - 2] = 64
    assert multimodal.decode_jpeg_pixels(bytes(mut)) is None
    # SOF2 + EOI without any scan is corrupt
    sof = p.find(b"\xff\xc2")
    lns = _s.unpack(">H", p[sof + 2:sof + 4])[0]
    assert multimodal.decode_jpeg_pixels(
        p[:sof + 2 + lns] + b"\xff\xd9"
    ) is None


def test_jpeg_progressive_population_combos():
    # the progressive tier intersects the color / 4:2:0 / restart
    # alternations, so every scan-structure combination that can occur
    # does occur in the synthetic population
    combos = set()
    for d in range(3, 5000, 9):
        if multimodal.synth_jpeg_is_progressive(d):
            combos.add((
                multimodal.synth_jpeg_is_color(d),
                multimodal.synth_jpeg_is_subsampled(d),
                multimodal.synth_jpeg_restart_interval(d) > 0,
            ))
    assert combos == {
        (False, False, False), (False, False, True),
        (True, False, False), (True, False, True),
        (True, True, False), (True, True, True),
    }


def test_jpeg_successive_approximation_roundtrip_exact():
    # successive approximation (Al=1 first scans + Ah=1/Al=0
    # refinement scans with correction bits and EOB-run bit buffering)
    # must reconstruct coefficients BIT-EXACTLY: decoded pixels equal
    # the baseline encoding of the same closed form
    import numpy as np

    combos = set()
    for doc_id in (129, 174, 309, 354, 489, 534):
        assert multimodal.synth_jpeg_succ_approx(doc_id)
        p = multimodal.synth_jpeg_payload(doc_id)
        px = multimodal.decode_jpeg_pixels(p)
        cf = _jpeg_closed_form(doc_id)
        assert px is not None and np.array_equal(px, cf), doc_id
        combos.add((
            multimodal.synth_jpeg_is_color(doc_id),
            multimodal.synth_jpeg_restart_interval(doc_id) > 0,
        ))
    # gray and color (4:2:0) docs, each with and without restarts
    assert combos == {(False, False), (False, True), (True, False),
                      (True, True)}


def test_jpeg_succ_approx_bits_are_load_bearing():
    # flipping one raw correction bit in the DC refinement scan must
    # change decoded pixels (the refinement stream is semantics, not
    # padding): find the DC-refinement SOS (AhAl = 0x10, Ss = Se = 0)
    # and corrupt its first payload byte
    import struct as _s
    import numpy as np

    p = multimodal.synth_jpeg_payload(129)  # gray SA doc
    right = multimodal.decode_jpeg_pixels(p)
    pos = 2
    target = None
    while pos + 4 <= len(p):
        if p[pos] != 0xFF:
            pos += 1
            continue
        m = p[pos + 1]
        if m == 0xDA:
            ln = _s.unpack(">H", p[pos + 2:pos + 4])[0]
            body = p[pos + 4:pos + 2 + ln]
            ns = body[0]
            if body[1 + 2 * ns] == 0 and body[3 + 2 * ns] == 0x01:
                target = pos + 2 + ln  # first entropy byte of DC refine
                break
            pos += 2 + ln
            continue
        if m in (0xD8,) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        pos += 2 + _s.unpack(">H", p[pos + 2:pos + 4])[0]
    assert target is not None
    mut = bytearray(p)
    mut[target] ^= 0x80  # flip the first refinement bit
    wrong = multimodal.decode_jpeg_pixels(bytes(mut))
    assert wrong is None or not np.array_equal(wrong, right)


def test_jpeg_progressive_tier_split():
    # the progressive population splits into spectral-selection-only
    # and successive-approximation halves, and SA docs are progressive
    prog = [d for d in range(3, 2000, 9)
            if multimodal.synth_jpeg_is_progressive(d)]
    sa = [d for d in prog if multimodal.synth_jpeg_succ_approx(d)]
    assert sa and len(sa) < len(prog)
    assert all(multimodal.synth_jpeg_is_progressive(d) for d in sa)
    # non-progressive docs are never SA
    assert not any(
        multimodal.synth_jpeg_succ_approx(d)
        for d in range(3, 2000, 9)
        if not multimodal.synth_jpeg_is_progressive(d)
    )


def test_adpcm_multiblock_decode():
    # the decoder is block-structured (each block re-seeds predictor +
    # step index from its headers — the property that makes a 100 TB
    # recording decode block-parallel); the synthetic population is
    # single-block, so build a 2-block mono container by hand and
    # check the reconstruction against the per-block recurrence
    import struct as _s
    import numpy as np

    spb = 9  # 1 header sample + 8 nibbles -> block_align = 4 + 4
    n = 14   # 9 + 5: second block partially filled
    samples = [((37 + 31 * i) % 61681) - 30840 for i in range(n)]
    blocks, want = [], []
    for b0 in range(0, n, spb):
        chunk = samples[b0:b0 + spb]
        pred, sidx = chunk[0], (7 * b0) % 89
        want.append(pred)
        head = _s.pack("<hBB", pred, sidx, 0)
        nibs = []
        for x in chunk[1:]:
            step = multimodal._IMA_STEP_TABLE[sidx]
            diff = x - pred
            sign = 8 if diff < 0 else 0
            delta, diffq = multimodal._ima_quantize(
                -diff if sign else diff, step)
            pred = max(-32768, min(32767, pred + (-diffq if sign else diffq)))
            sidx = max(0, min(88, sidx + multimodal._IMA_INDEX_TABLE[delta]))
            nibs.append(sign | delta)
            want.append(pred)
        nibs += [0] * (8 - len(nibs))
        blocks.append(head + bytes(
            nibs[2 * b] | (nibs[2 * b + 1] << 4) for b in range(4)
        ))
    data = b"".join(blocks)
    fmt = _s.pack("<HHIIHHHH", 0x11, 1, 8000, 8000 * 8 // spb, 8, 4, 2, spb)
    body = (
        b"WAVE"
        + b"fmt " + _s.pack("<I", len(fmt)) + fmt
        + b"fact" + _s.pack("<II", 4, n)
        + b"data" + _s.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + _s.pack("<I", len(body)) + body
    s = multimodal.decode_adpcm_samples(payload)
    assert s is not None and s.shape == (n, 1)
    assert np.array_equal(s[:, 0], np.array(want, dtype=np.int16))


def test_alaw_roundtrip_exact_and_strict():
    # A-law (format 0x0006): canonical extremes +-32256, container
    # roundtrip equal to the direct companding, strict tag separation
    # from mu-law
    import numpy as np

    assert multimodal.alaw_decode(multimodal.alaw_encode(32767)) == 32256
    assert multimodal.alaw_decode(multimodal.alaw_encode(-32768)) == -32256
    lossy = False
    for doc_id in (31, 34, 67, 70, 1003):
        assert multimodal.synth_audio_codec(doc_id) == "alaw"
        nch, _, n = multimodal.synth_audio_dims(doc_id)
        s = multimodal.decode_alaw_samples(multimodal.synth_alaw_payload(doc_id))
        assert s is not None and s.shape == (n, nch)
        want = np.array([
            [multimodal.alaw_decode(multimodal.alaw_encode(
                multimodal.synth_sample(doc_id, i, ch)))
             for ch in range(nch)] for i in range(n)
        ])
        assert np.array_equal(s, want), doc_id
        orig = np.array([
            [multimodal.synth_sample(doc_id, i, ch) for ch in range(nch)]
            for i in range(n)
        ])
        lossy = lossy or not np.array_equal(s, orig)
    assert lossy
    # the two G.711 tags do not cross-decode
    assert multimodal.decode_alaw_samples(
        multimodal.synth_ulaw_payload(13)) is None
    assert multimodal.decode_ulaw_samples(
        multimodal.synth_alaw_payload(31)) is None
    assert multimodal.decode_alaw_samples(
        multimodal.synth_alaw_payload(31)[:-3]) is None


def test_jpeg_ac_refinement_zrl_and_eob_correction_paths():
    # the synthetic coefficient layout never produces >15 zero-history
    # positions before a newly-significant coefficient, so drive the
    # refinement encoder/decoder pair directly on a crafted block:
    # history at k=10 (+2) and k=20 (-3), a newly-significant +1 at
    # k=40 behind 37 zero-history positions (forcing ZRL x2 with
    # interleaved correction-bit flushes), then an EOB-run block whose
    # history at k=7 takes a correction bit buffered through BE
    import numpy as np

    M = multimodal
    ac_code = M._huff_canonical(M._JPEG_AC_BITS_PROG, M._JPEG_AC_VALS_PROG)
    act = {(c, l): s for s, (c, l) in ac_code.items()}
    true1 = [0] * 64
    true1[10], true1[20], true1[40] = 2, -3, 1
    true2 = [0] * 64
    true2[7] = -3
    bw = M._MsbBitWriter()
    st = {"eobrun": 0, "be": []}
    M._jpeg_encode_ac_refine_block(bw, true1, 1, 63, 0, ac_code, st)
    M._jpeg_encode_ac_refine_block(bw, true2, 1, 63, 0, ac_code, st)
    M._jpeg_refine_flush_eob(bw, ac_code, st)
    data = bw.finish()
    # decoder starts from the Al=1 first-scan approximation
    row1 = np.zeros(64, dtype=np.int64)
    row1[10], row1[20] = 2, -2
    row2 = np.zeros(64, dtype=np.int64)
    row2[7] = -2
    br = M._MsbBitReader(data, 0)
    eob = M._jpeg_refine_ac_block(br, act, row1, 1, 63, 0, 0)
    assert eob is not None
    eob = M._jpeg_refine_ac_block(br, act, row2, 1, 63, 0, eob)
    assert eob == 0
    assert list(row1) == true1
    assert list(row2) == true2


def test_g711_codeword_idempotence():
    # encode(decode(b)) == b for every codeword — the classic table
    # self-consistency check.  One documented exception: mu-law 0x7F
    # is "negative zero", which decodes to 0 and re-encodes as the
    # positive-zero codeword 0xFF (the canonical +-0 ambiguity).
    for b in range(256):
        back = multimodal.ulaw_encode(multimodal.ulaw_decode(b))
        if b == 0x7F:
            assert multimodal.ulaw_decode(b) == 0 and back == 0xFF
        else:
            assert back == b, b
        assert multimodal.alaw_encode(multimodal.alaw_decode(b)) == b, b


def test_adpcm_extreme_signal_hits_clamps():
    # a full-swing alternating signal drives the step index to 88
    # (step 32767) and the predictor into both +-32768/32767 clamps;
    # the decoder must still be bit-exact against the encoder's
    # reconstruction
    import struct as _s
    import numpy as np

    n = 64
    samples = [32767 if i % 2 == 0 else -32768 for i in range(n)]
    words = (n - 1 + 7) // 8
    pred, sidx = samples[0], 0
    head = _s.pack("<hBB", pred, sidx, 0)
    nibs, want = [], [pred]
    hit_hi = hit_lo = False
    for x in samples[1:]:
        step = multimodal._IMA_STEP_TABLE[sidx]
        diff = x - pred
        sign = 8 if diff < 0 else 0
        delta, diffq = multimodal._ima_quantize(-diff if sign else diff, step)
        raw = pred + (-diffq if sign else diffq)
        hit_hi = hit_hi or raw > 32767
        hit_lo = hit_lo or raw < -32768
        pred = max(-32768, min(32767, raw))
        sidx = max(0, min(88, sidx + multimodal._IMA_INDEX_TABLE[delta]))
        nibs.append(sign | delta)
        want.append(pred)
    assert sidx == 88 and (hit_hi or hit_lo)  # extremes genuinely reached
    nibs += [0] * (8 * words - len(nibs))
    data = head + bytes(
        nibs[2 * b] | (nibs[2 * b + 1] << 4) for b in range(4 * words)
    )
    spb = 1 + 8 * words
    block_align = 4 + 4 * words
    fmt = _s.pack("<HHIIHHHH", 0x11, 1, 8000, 8000 * block_align // spb,
                  block_align, 4, 2, spb)
    body = (
        b"WAVE"
        + b"fmt " + _s.pack("<I", len(fmt)) + fmt
        + b"fact" + _s.pack("<II", 4, n)
        + b"data" + _s.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + _s.pack("<I", len(body)) + body
    s = multimodal.decode_adpcm_samples(payload)
    assert s is not None and s.shape == (n, 1)
    assert np.array_equal(s[:, 0], np.array(want, dtype=np.int16))
