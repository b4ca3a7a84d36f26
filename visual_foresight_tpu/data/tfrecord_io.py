"""Dependency-free TFRecord + ``tf.train.Example`` codec.

The reference wrote datasets with TF1's ``tf.python_io.TFRecordWriter``
(``visual_mpc/agent/utils/record_saver.py:21-56``).  Importing TensorFlow next
to MuJoCo/EGL and JAX in one process is both heavyweight and fragile, so this
module implements the two formats directly:

* **TFRecord framing**: ``uint64 length | masked crc32c(length) | payload |
  masked crc32c(payload)``; GZIP variant is a plain gzip stream of records.
* **Example protobuf**: ``Example{features: Features{feature: map<string,
  Feature{bytes_list|float_list|int64_list}>}}`` encoded/decoded by a minimal
  protobuf walker (packed and unpacked repeated fields both supported).

Files produced here are byte-compatible with TensorFlow's readers and vice
versa.
"""

import gzip
import struct

import google_crc32c
import numpy as np

# -- crc framing ------------------------------------------------------------------

_CRC_MASK_DELTA = 0xA282EAD8


def _masked_crc32c(data):
    crc = int.from_bytes(google_crc32c.Checksum(data).digest(), 'big')
    return (((crc >> 15) | (crc << 17)) + _CRC_MASK_DELTA) & 0xFFFFFFFF


def write_record(fobj, payload):
    length = struct.pack('<Q', len(payload))
    fobj.write(length)
    fobj.write(struct.pack('<I', _masked_crc32c(length)))
    fobj.write(payload)
    fobj.write(struct.pack('<I', _masked_crc32c(payload)))


def read_records(fobj, validate=False):
    """Yield record payloads from a (possibly gzip-wrapped) TFRecord stream."""
    while True:
        header = fobj.read(12)
        if len(header) < 12:
            return
        (length,) = struct.unpack('<Q', header[:8])
        if validate:
            (length_crc,) = struct.unpack('<I', header[8:12])
            assert length_crc == _masked_crc32c(header[:8]), 'corrupt length crc'
        payload = fobj.read(length)
        footer = fobj.read(4)
        if len(payload) < length or len(footer) < 4:
            return  # truncated tail
        if validate:
            (data_crc,) = struct.unpack('<I', footer)
            assert data_crc == _masked_crc32c(payload), 'corrupt data crc'
        yield payload


class TFRecordWriter:
    """File-level writer; ``compression='GZIP'`` matches the reference's
    ``TFRecordCompressionType.GZIP`` option."""

    def __init__(self, path, compression='GZIP'):
        if compression == 'GZIP':
            self._f = gzip.open(path, 'wb')
        elif compression in (None, ''):
            self._f = open(path, 'wb')
        else:
            raise ValueError('unsupported compression {}'.format(compression))

    def write(self, payload):
        write_record(self._f, payload)

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def tfrecord_iterator(path, compression='GZIP'):
    opener = gzip.open if compression == 'GZIP' else open
    with opener(path, 'rb') as f:
        yield from read_records(f)


# -- protobuf encoding --------------------------------------------------------------

def _varint(value):
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _signed_varint(value):
    # proto int64: negatives encode as 10-byte two's complement varints
    if value < 0:
        value += 1 << 64
    return _varint(value)


def _tag(field_number, wire_type):
    return _varint((field_number << 3) | wire_type)


def _len_delimited(field_number, payload):
    return _tag(field_number, 2) + _varint(len(payload)) + payload


class Feature:
    """One typed feature; ``kind`` in {'bytes', 'float', 'int64'}."""

    __slots__ = ('kind', 'values')

    def __init__(self, kind, values):
        self.kind = kind
        self.values = values

    def encode(self):
        if self.kind == 'bytes':
            inner = b''.join(_len_delimited(1, v) for v in self.values)
            return _len_delimited(1, inner)
        if self.kind == 'float':
            arr = np.asarray(self.values, dtype='<f4')
            inner = _tag(1, 2) + _varint(arr.nbytes) + arr.tobytes()
            return _len_delimited(2, inner)
        if self.kind == 'int64':
            packed = b''.join(_signed_varint(int(v)) for v in self.values)
            inner = _tag(1, 2) + _varint(len(packed)) + packed
            return _len_delimited(3, inner)
        raise ValueError('unknown feature kind {}'.format(self.kind))


def bytes_feature(value):
    return Feature('bytes', [value])


def float_feature(values):
    return Feature('float', values)


def int64_feature(values):
    return Feature('int64', values)


def encode_example(feature_dict):
    """Serialize {name: Feature} into a tf.train.Example payload."""
    entries = []
    for name, feat in feature_dict.items():
        key_bytes = name.encode('utf-8')
        entry = _len_delimited(1, key_bytes) + _len_delimited(2, feat.encode())
        entries.append(_len_delimited(1, entry))
    features_msg = b''.join(entries)
    return _len_delimited(1, features_msg)


# -- protobuf decoding ---------------------------------------------------------------

def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _iter_fields(buf, start=0, end=None):
    """Yield (field_number, wire_type, value_or_span) triples."""
    pos = start
    end = len(buf) if end is None else end
    while pos < end:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
            yield field, wire, val
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            yield field, wire, (pos, pos + length)
            pos += length
        elif wire == 5:
            yield field, wire, struct.unpack_from('<I', buf, pos)[0]
            pos += 4
        elif wire == 1:
            yield field, wire, struct.unpack_from('<Q', buf, pos)[0]
            pos += 8
        else:
            raise ValueError('unsupported wire type {}'.format(wire))


def _to_signed64(v):
    return v - (1 << 64) if v >= (1 << 63) else v


def _decode_feature(buf, span):
    """Decode a Feature message span -> (kind, values)."""
    for field, wire, val in _iter_fields(buf, *span):
        if field == 1:  # BytesList
            values = []
            for f2, w2, v2 in _iter_fields(buf, *val):
                if f2 == 1:
                    values.append(bytes(buf[v2[0]:v2[1]]))
            return 'bytes', values
        if field == 2:  # FloatList
            packed_parts, unpacked = [], []
            for f2, w2, v2 in _iter_fields(buf, *val):
                if f2 == 1 and w2 == 2:  # packed
                    packed_parts.append(np.frombuffer(buf[v2[0]:v2[1]], dtype='<f4'))
                elif f2 == 1 and w2 == 5:  # unpacked
                    unpacked.append(struct.unpack('<f', struct.pack('<I', v2))[0])
            if packed_parts:
                return 'float', (packed_parts[0] if len(packed_parts) == 1
                                 else np.concatenate(packed_parts))
            return 'float', np.asarray(unpacked, dtype=np.float32)
        if field == 3:  # Int64List
            values = []
            for f2, w2, v2 in _iter_fields(buf, *val):
                if f2 == 1 and w2 == 2:  # packed varints
                    pos, endp = v2
                    while pos < endp:
                        v, pos = _read_varint(buf, pos)
                        values.append(_to_signed64(v))
                elif f2 == 1 and w2 == 0:
                    values.append(_to_signed64(v2))
            return 'int64', np.asarray(values, dtype=np.int64)
    return 'bytes', []


def decode_example(payload, keys=None):
    """Parse a tf.train.Example payload into {name: (kind, values)}.

    If ``keys`` is given, only those feature names are decoded (cheap skip for
    the rest — important when records hold full trajectories but the consumer
    wants a few keys).
    """
    buf = memoryview(payload)
    out = {}
    for field, wire, span in _iter_fields(buf):
        if field != 1:
            continue
        for f2, w2, entry_span in _iter_fields(buf, *span):
            if f2 != 1:
                continue
            key, feat_span = None, None
            for f3, w3, v3 in _iter_fields(buf, *entry_span):
                if f3 == 1:
                    key = bytes(buf[v3[0]:v3[1]]).decode('utf-8')
                elif f3 == 2:
                    feat_span = v3
            if key is None or feat_span is None:
                continue
            if keys is not None and key not in keys:
                continue
            out[key] = _decode_feature(buf, feat_span)
    return out
