"""Embedded metadata namespaces: Exiv2-style EXIF/IPTC/XMP/text/ffmeta keys
through the property grammar (reference Media::readEmbeddedMetadata,
src/media.cpp:1627-1760, grammar src/media.cpp:761-803)."""

import io
import os
import struct

import numpy as np
import pytest
from PIL import Image

from cbird_tpu.store.media import Media, property_func
from cbird_tpu.store.metadata import read_embedded

XMP = b"""<?xpacket begin="" id="W5M0MpCehiHzreSzNTczkc9d"?>
<x:xmpmeta xmlns:x="adobe:ns:meta/">
 <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
  <rdf:Description rdf:about="" xmlns:dc="http://purl.org/dc/elements/1.1/"
    xmlns:photoshop="http://ns.adobe.com/photoshop/1.0/"
    photoshop:Credit="The Agency">
   <dc:subject><rdf:Bag><rdf:li>kittens</rdf:li><rdf:li>space</rdf:li></rdf:Bag></dc:subject>
   <dc:title><rdf:Alt><rdf:li xml:lang="x-default">Hello</rdf:li></rdf:Alt></dc:title>
  </rdf:Description>
 </rdf:RDF>
</x:xmpmeta>"""

pytestmark = pytest.mark.smoke


def _iptc_app13(datasets):
    """Hand-build a JPEG APP13 segment holding IPTC-IIM records
    (8BIM resource 0x0404)."""
    iim = b""
    for record, dataset, value in datasets:
        v = value.encode()
        iim += struct.pack(">BBBH", 0x1C, record, dataset, len(v)) + v
    res = b"8BIM" + struct.pack(">HH", 0x0404, 0) + struct.pack(">I", len(iim)) + iim
    if len(iim) % 2:
        res += b"\x00"
    payload = b"Photoshop 3.0\x00" + res
    return b"\xff\xed" + struct.pack(">H", len(payload) + 2) + payload


def _jpeg_with_metadata():
    img = Image.fromarray(np.full((48, 64), 120, np.uint8)).convert("RGB")
    exif = Image.Exif()
    exif[271] = "TestMakers"            # Make (IFD0)
    exif[272] = "TestCam 3000"          # Model (IFD0)
    exif[306] = "2020:01:02 03:04:05"   # DateTime (IFD0)
    from PIL.ExifTags import IFD
    exif.get_ifd(IFD.Exif)[36867] = "2021:06:07 08:09:10"  # DateTimeOriginal
    buf = io.BytesIO()
    img.save(buf, "JPEG", exif=exif.tobytes(), xmp=XMP)
    data = buf.getvalue()
    app13 = _iptc_app13([(2, 25, "kittens"), (2, 25, "space"),
                         (2, 80, "A. Byline"), (2, 105, "Big Headline")])
    return data[:2] + app13 + data[2:]  # insert after SOI


@pytest.fixture(scope="module")
def meta_jpeg(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("meta") / "tagged.jpg")
    with open(p, "wb") as f:
        f.write(_jpeg_with_metadata())
    return p


def test_exif_keys(meta_jpeg):
    data = open(meta_jpeg, "rb").read()
    vals = read_embedded(meta_jpeg, ["Exif.Image.Model",
                                     "Exif.Photo.DateTimeOriginal",
                                     "Exif.Image.DateTime",
                                     "Exif.Image.Nonexistent"], "exif", data)
    assert vals[0] == "TestCam 3000"
    assert vals[1] == "2021-06-07T08:09:10"  # Date keys → ISO
    assert vals[2] == "2020-01-02T03:04:05"
    assert vals[3] is None


def test_iptc_keys(meta_jpeg):
    vals = read_embedded(meta_jpeg, ["Iptc.Application2.Keywords",
                                     "Iptc.Application2.Byline",
                                     "Iptc.Application2.Headline"], "iptc")
    assert vals[0] == "kittens"  # first datum of repeated set (Exiv2 findKey)
    assert vals[1] == "A. Byline"
    assert vals[2] == "Big Headline"


def test_xmp_keys(meta_jpeg):
    vals = read_embedded(meta_jpeg, ["Xmp.dc.subject", "Xmp.dc.title",
                                     "Xmp.photoshop.Credit",
                                     "Xmp.dc.none"], "xmp")
    assert vals == ["kittens", "Hello", "The Agency", None]


def test_png_text(tmp_path):
    from PIL.PngImagePlugin import PngInfo
    pi = PngInfo()
    pi.add_text("Comment", "png comment here")
    p = str(tmp_path / "t.png")
    Image.fromarray(np.full((20, 20), 99, np.uint8)).save(p, "PNG", pnginfo=pi)
    assert read_embedded(p, ["Comment", "Missing"], "text") == \
        ["png comment here", None]


def test_property_grammar(meta_jpeg):
    """exif#<key1,keyN>[#func] — multi-key fallback, nocache, func chain."""
    m = Media(meta_jpeg, Media.TypeImage, 64, 48, "x")
    assert property_func("exif#Exif.Image.Model")(m) == "TestCam 3000"
    # first non-empty key wins
    f = property_func("exif#Exif.Image.Nope,Exif.Image.Make")
    assert f(m) == "TestMakers"
    assert property_func("exif#nocache,Exif.Image.Model")(m) == "TestCam 3000"
    # func chain: year of the capture date
    f = property_func("exif#Exif.Photo.DateTimeOriginal#year")
    assert f(m) == "2021"
    assert property_func("iptc#Iptc.Application2.Headline#upper")(m) == \
        "BIG HEADLINE"
    assert property_func("xmp#Xmp.dc.subject")(m) == "kittens"
    # missing tags are null (reference: null QVariant → %null matches)
    assert property_func("exif#Exif.Image.Nope")(m) is None
    with pytest.raises(ValueError):
        property_func("exif")  # key list required


def test_todate_func(meta_jpeg):
    m = Media(meta_jpeg, Media.TypeImage, 64, 48, "x")
    f = property_func("exif#Exif.Image.Model#todate")  # non-date untouched
    assert f(m) == "TestCam 3000"


def test_cli_with_exif_filter(meta_jpeg, tmp_path, capsys):
    """-with exif#... expression through the real CLI."""
    import shutil
    from cbird_tpu.cli.main import main
    root = str(tmp_path)
    shutil.copy(meta_jpeg, os.path.join(root, "tagged.jpg"))
    rng = np.random.default_rng(5)
    Image.fromarray((rng.uniform(0, 255, (48, 64))).astype(np.uint8)).convert(
        "RGB").save(os.path.join(root, "plain.jpg"))
    assert main(["-use", root, "-i.algos", "dct", "-i.fsize", "16",
                 "-create", "-update"]) == 0
    rc = main(["-use", root, "-select-all",
               "-with", "exif#Exif.Image.Model", "~TestCam", "-count"])
    assert rc == 0
    assert "1 items" in capsys.readouterr().out


def test_null_vs_empty_metadata(meta_jpeg, tmp_path):
    """%null matches files whose tag is absent (src/commands.cpp:191-197)."""
    from cbird_tpu.cli.commands import compile_filter
    m_tagged = Media(meta_jpeg, Media.TypeImage, 64, 48, "x")
    p = str(tmp_path / "plain.png")
    Image.fromarray(np.full((20, 20), 50, np.uint8)).save(p)
    m_plain = Media(p, Media.TypeImage, 20, 20, "y")
    pred = compile_filter("exif#Exif.Image.Model", "%null")
    assert pred(m_plain, None)
    assert not pred(m_tagged, None)
    pred = compile_filter("exif#Exif.Image.Model", "!%null")
    assert pred(m_tagged, None)
