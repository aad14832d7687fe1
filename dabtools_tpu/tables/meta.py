"""Display-name tables from TS 101 756 (registered tables).

Reference counterpart: none — upstream dabtools prints raw ids only.
[K-med — reconstructed from the public registered-tables standard;
wrong names are cosmetic (ids are always shown too).]
"""

from __future__ import annotations

# TS 101 756 table 9 (European languages; the 0x40+ world-language half
# is omitted — unknown codes fall back to hex via `language_name`).
LANGUAGES = {
    0x00: "unknown", 0x01: "Albanian", 0x02: "Breton", 0x03: "Catalan",
    0x04: "Croatian", 0x05: "Welsh", 0x06: "Czech", 0x07: "Danish",
    0x08: "German", 0x09: "English", 0x0A: "Spanish", 0x0B: "Esperanto",
    0x0C: "Estonian", 0x0D: "Basque", 0x0E: "Faroese", 0x0F: "French",
    0x10: "Frisian", 0x11: "Irish", 0x12: "Gaelic", 0x13: "Galician",
    0x14: "Icelandic", 0x15: "Italian", 0x16: "Sami", 0x17: "Latin",
    0x18: "Latvian", 0x19: "Luxembourgian", 0x1A: "Lithuanian",
    0x1B: "Hungarian", 0x1C: "Maltese", 0x1D: "Dutch", 0x1E: "Norwegian",
    0x1F: "Occitan", 0x20: "Polish", 0x21: "Portuguese", 0x22: "Romanian",
    0x23: "Romansh", 0x24: "Serbian", 0x25: "Slovak", 0x26: "Slovene",
    0x27: "Finnish", 0x28: "Swedish", 0x29: "Turkish", 0x2A: "Flemish",
    0x2B: "Walloon",
}

# TS 101 756 table 12 (programme type international codes).
PROGRAMME_TYPES = {
    0: "None", 1: "News", 2: "Current Affairs", 3: "Information",
    4: "Sport", 5: "Education", 6: "Drama", 7: "Culture", 8: "Science",
    9: "Varied", 10: "Pop Music", 11: "Rock Music", 12: "Easy Listening",
    13: "Light Classical", 14: "Serious Classical", 15: "Other Music",
    16: "Weather", 17: "Finance", 18: "Children's", 19: "Social Affairs",
    20: "Religion", 21: "Phone In", 22: "Travel", 23: "Leisure",
    24: "Jazz Music", 25: "Country Music", 26: "National Music",
    27: "Oldies Music", 28: "Folk Music", 29: "Documentary",
}


def language_name(code: int) -> str:
    return LANGUAGES.get(code, f"lang 0x{code:02X}")


def programme_type_name(code: int) -> str:
    return PROGRAMME_TYPES.get(code, f"PTy {code}")
