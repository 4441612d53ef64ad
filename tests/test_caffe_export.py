"""Caffe export round-trip: decode the emitted caffemodel wire format with an
independent minimal protobuf reader and verify structure + weight bits."""

import struct

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demonet_tpu.export.caffe import export_caffe


def _read_varint(buf, pos):
    result, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf):
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            val = struct.unpack("<f", buf[pos:pos + 4])[0]
            pos += 4
        else:
            raise ValueError(f"wire {wire}")
        yield field, wire, val


def _parse_prototxt_eltwise(txt):
    """Parse {name: operation} for every Eltwise layer in a deploy prototxt."""
    import re

    out = {}
    for block in re.findall(r"layer \{(.*?)\n\}", txt, re.S):
        if 'type: "Eltwise"' not in block:
            continue
        name = re.search(r'name: "([^"]+)"', block).group(1)
        m = re.search(r"eltwise_param \{ operation: (\w+) \}", block)
        # Caffe's EltwiseParameter defaults to SUM when omitted
        out[name] = m.group(1) if m else "SUM"
    return out


def _parse_layer(buf):
    layer = {"bottoms": [], "tops": [], "blobs": []}
    for field, wire, val in _iter_fields(buf):
        if field == 1:
            layer["name"] = val.decode()
        elif field == 2:
            layer["type"] = val.decode()
        elif field == 110:  # eltwise_param
            for f2, _w2, v2 in _iter_fields(val):
                if f2 == 1:
                    layer["eltwise_op"] = v2
        elif field == 3:
            layer["bottoms"].append(val.decode())
        elif field == 4:
            layer["tops"].append(val.decode())
        elif field == 7:
            blob = {}
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 7:  # shape
                    for f3, w3, v3 in _iter_fields(v2):
                        if f3 == 1:
                            dims, p = [], 0
                            while p < len(v3):
                                d, p = _read_varint(v3, p)
                                dims.append(d)
                            blob["shape"] = dims
                elif f2 == 5:  # packed data
                    blob["data"] = np.frombuffer(v2, np.float32)
            layer["blobs"].append(blob)
    return layer


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    from demonet_tpu.models import mobilenet_v2

    d = tmp_path_factory.mktemp("caffe")
    m = mobilenet_v2(num_classes=7)
    variables = jax.device_get(
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    net = export_caffe("mobilenet_v2", variables,
                       str(d / "net.prototxt"), str(d / "net.caffemodel"),
                       num_classes=7, input_size=64)
    return d, variables, net


def test_prototxt_structure(exported):
    d, _, net = exported
    txt = (d / "net.prototxt").read_text()
    assert txt.startswith('name: "mobilenet_v2"')
    assert txt.count("layer {") == len(net.layers)
    assert 'type: "Convolution"' in txt
    assert "group:" in txt  # depthwise convs present
    assert 'type: "Eltwise"' in txt  # residual adds
    assert 'type: "Softmax"' in txt


def test_caffemodel_decodes_and_matches_weights(exported):
    d, variables, net = exported
    buf = (d / "net.caffemodel").read_bytes()
    name = None
    layers = []
    for field, wire, val in _iter_fields(buf):
        if field == 1:
            name = val.decode()
        elif field == 100:
            layers.append(_parse_layer(val))
    assert name == "mobilenet_v2"
    assert len(layers) == len(net.layers)

    by_name = {l["name"]: l for l in layers}
    # stem conv weights: flax HWIO -> caffe OIHW
    stem = by_name["stem"]
    assert stem["type"] == "Convolution"
    w = variables["params"]["features"]["stem"]["conv"]["kernel"]
    got = stem["blobs"][0]
    assert got["shape"] == [32, 3, 3, 3]
    np.testing.assert_array_equal(
        got["data"].reshape(32, 3, 3, 3),
        np.transpose(np.asarray(w), (3, 2, 0, 1)))
    # BN layer carries mean/var/scale-factor triple
    bn = by_name["stem_bn"]
    assert bn["type"] == "BatchNorm" and len(bn["blobs"]) == 3
    assert bn["blobs"][2]["data"][0] == 1.0
    # classifier InnerProduct has (O, I) weights
    clf = by_name["classifier"]
    assert clf["blobs"][0]["shape"] == [7, 1280]


def test_unknown_family_raises():
    with pytest.raises(ValueError):
        export_caffe("not_a_model", {}, "/tmp/x", "/tmp/y")


def test_detector_caffe_export(tmp_path):
    import jax as _jax

    from demonet_tpu.models import ssd_lite_mobilenet_v2

    det = ssd_lite_mobilenet_v2(num_classes=5, size=(96, 96))
    variables = _jax.device_get(det.init(_jax.random.PRNGKey(0)))
    net = export_caffe("ssd_lite_mobilenet_v2", variables,
                       str(tmp_path / "d.prototxt"),
                       str(tmp_path / "d.caffemodel"),
                       num_classes=5, input_size=96)
    txt = (tmp_path / "d.prototxt").read_text()
    assert txt.count('"Permute"') == 12        # 6 levels x (loc + conf)
    assert txt.count('"Concat"') == 2          # mbox_loc + mbox_conf
    assert '"Reshape"' in txt and '"Softmax"' in txt
    assert "group:" in txt
    # every conv blob present in the binary
    buf = (tmp_path / "d.caffemodel").read_bytes()
    assert len(buf) > 1_000_000


def test_ssdlite_mnv3_caffe_export(tmp_path):
    import jax as _jax

    from demonet_tpu.models import ssdlite320_mobilenet_v3_large

    det = ssdlite320_mobilenet_v3_large(num_classes=5, size=(96, 96))
    variables = _jax.device_get(det.init(_jax.random.PRNGKey(0)))
    net = export_caffe("ssdlite320_mobilenet_v3_large", variables,
                       str(tmp_path / "m.prototxt"),
                       str(tmp_path / "m.caffemodel"),
                       num_classes=5, input_size=96)
    txt = (tmp_path / "m.prototxt").read_text()
    assert txt.count('"Permute"') == 12
    # hard-swish decomposition present (Power/Eltwise PROD chains);
    # the x * hard_sigmoid(x) products must serialize as PROD, not SUM
    assert '"Power"' in txt
    assert 'type: "Eltwise"' in txt
    n_prod_ir = sum(1 for l in net.layers
                    if l.type == "Eltwise" and l.params.get("operation", 1) == 0)
    n_sum_ir = sum(1 for l in net.layers
                   if l.type == "Eltwise" and l.params.get("operation", 1) == 1)
    assert n_prod_ir > 0  # hswish products exist in this family
    assert txt.count("operation: PROD") == n_prod_ir
    assert txt.count("operation: SUM") == n_sum_ir
    # round-trip: re-parse the serialized prototxt (not the in-memory IR)
    # and check each Eltwise layer's operation against the IR
    reparsed = _parse_prototxt_eltwise(txt)
    ir_ops = {l.name: {0: "PROD", 1: "SUM", 2: "MAX"}[l.params.get("operation", 1)]
              for l in net.layers if l.type == "Eltwise"}
    assert reparsed == ir_ops
    # SE: two-bottom Scale with axis 0
    assert "scale_param { axis: 0 }" in txt
    # binary decodes layer-for-layer
    buf = (tmp_path / "m.caffemodel").read_bytes()
    layers = []
    for field, wire, val in _iter_fields(buf):
        if field == 100:
            layers.append(_parse_layer(val))
    assert len(layers) == len(net.layers)
    # binary eltwise_param operation matches the IR (PROD=0 / SUM=1)
    bin_ops = {l["name"]: l.get("eltwise_op", 1)
               for l in layers if l.get("type") == "Eltwise"}
    assert bin_ops == {l.name: l.params.get("operation", 1)
                       for l in net.layers if l.type == "Eltwise"}
    assert 0 in bin_ops.values() and 1 in bin_ops.values()
    by_name = {l["name"]: l for l in layers}
    # C4 tap: expand conv of the last strided block exists
    assert any(n.endswith("_expand") for n in by_name)
    # an SE fc conv carries a bias blob
    se_fc = next(l for n, l in by_name.items() if n.endswith("se_fc1"))
    assert len(se_fc["blobs"]) == 2


def test_pelee_caffe_export(tmp_path):
    import jax as _jax

    from demonet_tpu.models.builders import pelee304

    det = pelee304(num_classes=4, size=(96, 96))
    variables = _jax.device_get(det.init(_jax.random.PRNGKey(0)))
    net = export_caffe("pelee304", variables,
                       str(tmp_path / "p.prototxt"),
                       str(tmp_path / "p.caffemodel"),
                       num_classes=4, input_size=96)
    txt = (tmp_path / "p.prototxt").read_text()
    # two-branch dense layers concat 3 bottoms; stem concats 2
    assert 'name: "stem_concat"' in txt
    assert 'name: "denseblock1_layer1_concat"' in txt
    assert txt.count('"Permute"') == 10     # 5 maps x (loc+conf)
    # ResBlock residual adds: one per source
    assert txt.count("_add") >= 5
    buf = (tmp_path / "p.caffemodel").read_bytes()
    layers = []
    for field, wire, val in _iter_fields(buf):
        if field == 100:
            layers.append(_parse_layer(val))
    assert len(layers) == len(net.layers)
    by_name = {l["name"]: l for l in layers}
    # transition3 conv weights round-trip
    t3 = by_name["transition3"]
    w = variables["params"]["extractor"]["trunk"]["transition3"]["conv"]["kernel"]
    np.testing.assert_array_equal(
        t3["blobs"][0]["data"].reshape(t3["blobs"][0]["shape"]),
        np.transpose(np.asarray(w), (3, 2, 0, 1)))


def test_export_cli_caffe_format(tmp_path):
    from demonet_tpu.export import cli as export_cli

    args = export_cli.get_args_parser().parse_args([
        "--model", "ssd_lite_mobilenet_v2", "--num-classes", "4",
        "--format", "caffe", "--output", str(tmp_path / "deploy")])
    export_cli.main(args)
    assert (tmp_path / "deploy.prototxt").exists()
    assert (tmp_path / "deploy.caffemodel").exists()


def test_vgg_caffe_export(tmp_path):
    import jax as _jax

    from demonet_tpu.models import ssd300_vgg16

    det = ssd300_vgg16(num_classes=6)
    variables = _jax.device_get(det.init(_jax.random.PRNGKey(0)))
    export_caffe("ssd300_vgg16", variables,
                 str(tmp_path / "v.prototxt"), str(tmp_path / "v.caffemodel"),
                 num_classes=6, input_size=300)
    txt = (tmp_path / "v.prototxt").read_text()
    assert txt.count('"Normalize"') == 1         # conv4_3 L2 rescale
    assert txt.count("FLOOR") == 3               # pools 1/2/4
    assert "dilation: 6" in txt                  # atrous fc6
    # binary decodes; fc6 blob has the atrous conv shape
    buf = (tmp_path / "v.caffemodel").read_bytes()
    layers = {}
    for field, wire, val in _iter_fields(buf):
        if field == 100:
            l = _parse_layer(val)
            layers[l["name"]] = l
    assert layers["fc6"]["blobs"][0]["shape"] == [1024, 512, 3, 3]
    assert layers["conv4_3_norm"]["blobs"][0]["shape"] == [512]


def test_export_cli_caffe_generic(tmp_path):
    from demonet_tpu.export import cli as export_cli

    args = export_cli.get_args_parser().parse_args([
        "--model", "ssd_lite_mobilenet_v2", "--num-classes", "4",
        "--format", "caffe", "--generic",
        "--output", str(tmp_path / "gen")])
    export_cli.main(args)
    txt = (tmp_path / "gen.prototxt").read_text()
    assert 'type: "Convolution"' in txt
    assert (tmp_path / "gen.caffemodel").stat().st_size > 100_000
