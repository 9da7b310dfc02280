"""MIME type detection (util/MimeUtil.java, which delegates to Tika's
three-signal resolver: content magic, the server's Content-Type header, and
the URL extension).

Re-expressed as a pure column expression — a CASE chain over magic-byte
prefixes, then the cleaned header, then the extension map — so detection runs
inside whole-stage codegen on the JVM with zero Python. Magic outranks the
header (servers lie: MimeUtil.autoResolveContentType), the header outranks
the extension.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# magic-byte prefixes, checked against the first bytes of the content
# (hex for binary magics so the same expression serves BINARY columns).
# All signatures are the published file-format magics (the same public set
# Tika's mimetypes registry encodes).
_MAGIC_HEX = [
    ("255044462D", "application/pdf"),     # %PDF-
    ("89504E47", "image/png"),
    ("47494638", "image/gif"),             # GIF8
    ("FFD8FF", "image/jpeg"),
    ("49492A00", "image/tiff"),            # II*. little-endian
    ("4D4D002A", "image/tiff"),            # MM.* big-endian
    ("38425053", "image/vnd.adobe.photoshop"),  # 8BPS
    ("D0CF11E0A1B11AE1", "application/x-ole-storage"),  # legacy .doc/.xls/.ppt
    ("504B0304", "application/zip"),
    ("1F8B", "application/gzip"),
    ("425A68", "application/x-bzip2"),     # BZh
    ("FD377A585A00", "application/x-xz"),
    ("377ABCAF271C", "application/x-7z-compressed"),
    # full RAR signatures (r16; the bare 4-byte Rar! prefix false-hit on
    # text): v1.5-4.x is Rar!\x1A\x07\x00, v5+ Rar!\x1A\x07\x01\x00 —
    # the length-bucketed lookup tries the longer v5 signature first
    ("526172211A070100", "application/x-rar-compressed"),  # RAR5
    ("526172211A0700", "application/x-rar-compressed"),    # RAR4
    ("28B52FFD", "application/zstd"),
    ("04224D18", "application/x-lz4"),
    ("7B5C727466", "application/rtf"),     # {\rtf
    ("FF575043", "application/vnd.wordperfect"),  # \xFFWPC prefix header
    ("49545346", "application/vnd.ms-htmlhelp"),  # ITSF (compiled HTML help)
    ("4D534346", "application/vnd.ms-cab-compressed"),  # MSCF cabinet
    ("252150532D", "application/postscript"),  # %!PS-
    ("7F454C46", "application/x-executable"),  # \x7fELF
    ("CAFEBABE", "application/java-vm"),
    ("0061736D", "application/wasm"),      # \0asm
    ("774F4646", "font/woff"),             # wOFF
    ("774F4632", "font/woff2"),            # wOF2
    ("00000018667479", "video/mp4"),
    ("4D546864", "audio/midi"),            # MThd
    ("494433", "audio/mpeg"),              # ID3
    ("664C6143", "audio/flac"),            # fLaC
    ("4F676753", "application/ogg"),       # OggS
    ("1A45DFA3", "video/webm"),            # EBML (Matroska/WebM family)
    ("000001BA", "video/mpeg"),
    ("000001B3", "video/mpeg"),
    ("52494646", "audio/x-wav"),           # RIFF (refined below: WAVE/AVI/WEBP)
    # ------------------------------------------------------------------
    # r16 magic tranche 2 — the next tika-mimetypes.xml families by crawl
    # hit rate: fonts, legacy audio, archive subtypes, databases. All are
    # the published format magics; lookup is length-bucketed maps, so
    # table width no longer costs codegen branches.
    # ------------------------------------------------------------------
    # fonts (sfnt family: version tag leads the file)
    ("252150532D41646F6265466F6E74", "application/x-font-type1"),
    # ^ '%!PS-AdobeFont' (PFA) — outranks the bare '%!PS-' postscript
    # entry purely by prefix length in the bucketed lookup
    ("4F54544F", "font/otf"),              # 'OTTO' (CFF outlines)
    ("74746366", "font/collection"),       # 'ttcf' TrueType collection
    ("0001000000", "font/ttf"),            # sfnt 1.0 (TrueType outlines)
    ("74727565", "font/ttf"),              # 'true' legacy Mac sfnt
    # legacy audio
    ("2E736E64", "audio/basic"),           # '.snd' Sun/NeXT AU
    ("2321414D522D57420A", "audio/amr-wb"),  # '#!AMR-WB\n'
    ("2321414D520A", "audio/amr"),         # '#!AMR\n'
    ("44534420", "audio/x-dsf"),           # 'DSD ' DSD stream file
    ("46524D38", "audio/x-dff"),           # 'FRM8' DSDIFF
    ("63616666", "audio/x-caf"),           # 'caff' Core Audio Format
    ("2E524D46", "application/vnd.rn-realmedia"),  # '.RMF'
    ("3026B2758E66CF11", "video/x-ms-asf"),  # ASF GUID (refined by ext: wma)
    ("464C5601", "video/x-flv"),           # 'FLV\x01'
    ("4D414320", "audio/x-ape"),           # 'MAC ' Monkey's Audio
    ("4D502B", "audio/x-musepack"),        # 'MP+' (MPC SV7)
    ("4D50434B", "audio/x-musepack"),      # 'MPCK' (MPC SV8)
    # archive subtypes / packages
    ("68737173", "application/x-squashfs"),  # 'hsqs' little-endian
    ("73717368", "application/x-squashfs"),  # 'sqsh' big-endian
    ("4C5A4950", "application/x-lzip"),    # 'LZIP'
    ("EDABEEDB", "application/x-rpm"),
    ("303730373031", "application/x-cpio"),  # '070701' newc ASCII
    ("303730373032", "application/x-cpio"),  # '070702' CRC ASCII
    ("303730373037", "application/x-cpio"),  # '070707' odc ASCII
    ("C771", "application/x-cpio"),        # old binary LE
    ("71C7", "application/x-cpio"),        # old binary BE
    ("78617221", "application/x-xar"),     # 'xar!'
    ("1F9D", "application/x-compress"),    # .Z (LZW compress)
    ("60EA", "application/x-arj"),
    ("53747566664974", "application/x-stuffit"),  # 'StuffIt' (SIT5)
    ("53495421", "application/x-stuffit"),  # 'SIT!'
    # databases / scientific
    ("53514C69746520666F726D6174203300", "application/vnd.sqlite3"),
    ("894844460D0A1A0A", "application/x-hdf5"),
    ("0E031301", "application/x-hdf"),      # HDF4
    ("43444601", "application/x-netcdf"),   # 'CDF\x01' classic
    ("43444602", "application/x-netcdf"),   # 'CDF\x02' 64-bit offset
    ("50415231", "application/vnd.apache.parquet"),  # 'PAR1'
    ("D4C3B2A1", "application/vnd.tcpdump.pcap"),    # pcap LE
    ("A1B2C3D4", "application/vnd.tcpdump.pcap"),    # pcap BE
    ("4D34A195", "application/vnd.tcpdump.pcap"),    # pcap LE ns-resolution
    ("0A0D0D0A", "application/x-pcapng"),  # Section Header Block
    # ebooks / misc containers
    ("41542654464F524D", "image/vnd.djvu"),  # 'AT&TFORM'
    ("425047FB", "image/x-bpg"),
    ("000000144A584C200D0A870A", "image/jxl"),  # JXL ISO-BMFF container
    ("FF0A", "image/jxl"),                 # JXL raw codestream
]

# container refinements resolved from bytes past the leading magic:
# (container-prefix hex, (subtype hex at given BYTE offset, mime))
_RIFF_SUBTYPES = [  # RIFF<size> then the form type at byte offset 8
    ("57454250", "image/webp"),   # WEBP
    ("41564920", "video/x-msvideo"),  # 'AVI '
    ("57415645", "audio/x-wav"),  # WAVE
]
_FTYP_BRANDS = [  # ISO-BMFF: 'ftyp' at byte 4, brand at byte 8 (the Tika
    # tika-mimetypes brand families for the container-sharing formats)
    ("68656963", "image/heic"),   # heic
    ("68656978", "image/heic"),   # heix
    ("68657663", "image/heic-sequence"),  # hevc
    ("68657678", "image/heic-sequence"),  # hevx
    ("6865696D", "image/heif"),   # heim
    ("68656973", "image/heif"),   # heis
    ("6D696631", "image/heif"),   # mif1
    ("6D736631", "image/heif-sequence"),  # msf1
    ("61766966", "image/avif"),   # avif
    ("61766973", "image/avif-sequence"),  # avis
    ("4D344120", "audio/mp4"),    # 'M4A '
    ("4D344220", "audio/mp4"),    # 'M4B ' (audiobook)
    ("4D345020", "audio/mp4"),    # 'M4P '
    ("4D345620", "video/x-m4v"),  # 'M4V '
    ("33677034", "video/3gpp"),   # 3gp4
    ("33677035", "video/3gpp"),   # 3gp5
    ("33677036", "video/3gpp"),   # 3gp6
    ("33677070", "video/3gpp"),   # 3gpp
    ("33673261", "video/3gpp2"),  # 3g2a
    ("6D6A7032", "video/mj2"),    # mjp2
    ("71742020", "video/quicktime"),  # 'qt  '
]

# OLE2 compound files share one magic (D0CF11E0); the real subtype lives in
# the directory-entry names (UTF-16LE storage/stream names — the same names
# Tika's POIFSContainerDetector keys on). The column form searches the head
# of the file; directories past the search window fall back to the
# extension refinement, then to generic x-ole-storage.
_OLE_NEEDLES = [
    ("WordDocument", "application/msword"),
    ("Workbook", "application/vnd.ms-excel"),
    ("PowerPoint Document", "application/vnd.ms-powerpoint"),
    ("VisioDocument", "application/vnd.visio"),
    ("EncryptedPackage", "application/x-tika-ooxml-protected"),
]
_OLE_EXT = {
    "doc": "application/msword",
    "dot": "application/msword",
    "xls": "application/vnd.ms-excel",
    "xlt": "application/vnd.ms-excel",
    "ppt": "application/vnd.ms-powerpoint",
    "pot": "application/vnd.ms-powerpoint",
    "vsd": "application/vnd.visio",
    "msi": "application/x-msi",
    "msg": "application/vnd.ms-outlook",
}

# OOXML: the zip's leading entries carry the package part names; the main
# document part pins the flavor (Tika inspects the same entry names). Long
# needles so a match inside compressed payload bytes is vanishingly
# unlikely.
_OOXML_NEEDLES = [
    ("word/document.xml", "application/vnd.openxmlformats-officedocument.wordprocessingml.document"),
    ("xl/workbook.xml", "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"),
    ("ppt/presentation.xml", "application/vnd.openxmlformats-officedocument.presentationml.presentation"),
    ("visio/document.xml", "application/vnd.ms-visio.drawing"),
]
# zip containers refined by URL extension (Tika inspects entry names; the
# column expression uses the extension, which OOXML/ODF links always carry)
_ZIP_EXT = {
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "docm": "application/vnd.ms-word.document.macroenabled.12",
    "xlsm": "application/vnd.ms-excel.sheet.macroenabled.12",
    "pptm": "application/vnd.ms-powerpoint.presentation.macroenabled.12",
    "dotx": "application/vnd.openxmlformats-officedocument.wordprocessingml.template",
    "xltx": "application/vnd.openxmlformats-officedocument.spreadsheetml.template",
    "potx": "application/vnd.openxmlformats-officedocument.presentationml.template",
    "odt": "application/vnd.oasis.opendocument.text",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "odp": "application/vnd.oasis.opendocument.presentation",
    "odg": "application/vnd.oasis.opendocument.graphics",
    "jar": "application/java-archive",
    "epub": "application/epub+zip",
    "apk": "application/vnd.android.package-archive",
    "pages": "application/vnd.apple.pages",
    "numbers": "application/vnd.apple.numbers",
    "key": "application/vnd.apple.keynote",
    "kmz": "application/vnd.google-earth.kmz",
    "cbz": "application/vnd.comicbook+zip",
    "xpi": "application/x-xpinstall",
    "vsdx": "application/vnd.ms-visio.drawing",
}

_EXT = {
    "html": "text/html",
    "htm": "text/html",
    "xhtml": "application/xhtml+xml",
    "xml": "application/xml",
    "eml": "message/rfc822",
    "mbox": "application/mbox",
    "txt": "text/plain",
    "css": "text/css",
    "js": "application/javascript",
    "json": "application/json",
    "pdf": "application/pdf",
    "png": "image/png",
    "gif": "image/gif",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "svg": "image/svg+xml",
    "ico": "image/x-icon",
    "zip": "application/zip",
    "gz": "application/gzip",
    "mp3": "audio/mpeg",
    "mp4": "video/mp4",
    "rss": "application/rss+xml",
    "atom": "application/atom+xml",
    "webp": "image/webp",
    "bmp": "image/bmp",
    "tif": "image/tiff",
    "tiff": "image/tiff",
    "heic": "image/heic",
    "avif": "image/avif",
    "doc": "application/msword",
    "xls": "application/vnd.ms-excel",
    "ppt": "application/vnd.ms-powerpoint",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "odt": "application/vnd.oasis.opendocument.text",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "odp": "application/vnd.oasis.opendocument.presentation",
    "rtf": "application/rtf",
    "ps": "application/postscript",
    "eps": "application/postscript",
    "csv": "text/csv",
    "tsv": "text/tab-separated-values",
    "md": "text/markdown",
    "yaml": "application/yaml",
    "yml": "application/yaml",
    "7z": "application/x-7z-compressed",
    "rar": "application/x-rar-compressed",
    "xz": "application/x-xz",
    "zst": "application/zstd",
    "bz2": "application/x-bzip2",
    "tar": "application/x-tar",
    "jar": "application/java-archive",
    "war": "application/java-archive",
    "epub": "application/epub+zip",
    "apk": "application/vnd.android.package-archive",
    "wpd": "application/vnd.wordperfect",
    "chm": "application/vnd.ms-htmlhelp",
    "cab": "application/vnd.ms-cab-compressed",
    "pages": "application/vnd.apple.pages",
    "numbers": "application/vnd.apple.numbers",
    # ".key" deliberately NOT mapped to Keynote here: on a crawl, .key
    # URLs are usually private-key/license files; Keynote packages still
    # type via the zip/iWork content dispatch
    "wasm": "application/wasm",
    "woff": "font/woff",
    "woff2": "font/woff2",
    "ttf": "font/ttf",
    "otf": "font/otf",
    "ttc": "font/collection",
    "eot": "application/vnd.ms-fontobject",
    "pfb": "application/x-font-type1",
    "flac": "audio/flac",
    "ogg": "application/ogg",
    "oga": "audio/ogg",
    "ogv": "video/ogg",
    "opus": "audio/opus",
    "webm": "video/webm",
    "avi": "video/x-msvideo",
    "mov": "video/quicktime",
    "mkv": "video/x-matroska",
    "mka": "audio/x-matroska",
    "m4a": "audio/mp4",
    "m4v": "video/mp4",
    "wav": "audio/x-wav",
    "mid": "audio/midi",
    "midi": "audio/midi",
    "exe": "application/x-msdownload",
    "dll": "application/x-msdownload",
    "swf": "application/x-shockwave-flash",
    "php": "text/x-php",
    "jsp": "text/x-jsp",
    "asp": "text/x-asp",
    # ------------------------------------------------------------------
    # round 14: the glob layer widened toward Tika's public
    # tika-mimetypes.xml surface (util/MimeUtil.java resolves the URL
    # extension through the same registry). IANA registrations where they
    # exist; the conventional x- names (Tika's) where they don't.
    # ------------------------------------------------------------------
    # source code / markup (text family: crawlers index these as text)
    "c": "text/x-csrc",
    "h": "text/x-chdr",
    "cpp": "text/x-c++src",
    "cxx": "text/x-c++src",
    "cc": "text/x-c++src",
    "hpp": "text/x-c++hdr",
    "java": "text/x-java-source",
    "py": "text/x-python",
    "rb": "text/x-ruby",
    "go": "text/x-go",
    "scala": "text/x-scala",
    "groovy": "text/x-groovy",
    "pl": "text/x-perl",
    "pm": "text/x-perl",
    "lua": "text/x-lua",
    "tcl": "text/x-tcl",
    "sh": "application/x-sh",
    "csh": "application/x-csh",
    "bash": "application/x-sh",
    "sql": "text/x-sql",
    "diff": "text/x-diff",
    "patch": "text/x-diff",
    "ini": "text/plain",
    "cfg": "text/plain",
    "conf": "text/plain",
    "log": "text/plain",
    "text": "text/plain",
    "asc": "text/plain",
    "toml": "application/toml",
    "rst": "text/x-rst",
    "tex": "application/x-tex",
    "latex": "application/x-latex",
    "bib": "text/x-bibtex",
    "srt": "application/x-subrip",
    "vtt": "text/vtt",
    "sgml": "text/sgml",
    "sgm": "text/sgml",
    "vm": "text/plain",
    # structured data / semantic web
    "jsonld": "application/ld+json",
    "ndjson": "application/x-ndjson",
    "jsonl": "application/x-ndjson",
    "geojson": "application/geo+json",
    "xsl": "application/xslt+xml",
    "xslt": "application/xslt+xml",
    "dtd": "application/xml-dtd",
    "xsd": "application/xml",
    "wsdl": "application/wsdl+xml",
    "rdf": "application/rdf+xml",
    "owl": "application/rdf+xml",
    "ttl": "text/turtle",
    "n3": "text/n3",
    "nt": "application/n-triples",
    "nq": "application/n-quads",
    "kml": "application/vnd.google-earth.kml+xml",
    "gpx": "application/gpx+xml",
    "ics": "text/calendar",
    "ifb": "text/calendar",
    "vcf": "text/vcard",
    "vcard": "text/vcard",
    "webmanifest": "application/manifest+json",
    "har": "application/json",
    "avsc": "application/json",
    # documents / ebooks / office
    "abw": "application/x-abiword",
    "azw": "application/vnd.amazon.ebook",
    "azw3": "application/vnd.amazon.mobi8-ebook",
    "mobi": "application/x-mobipocket-ebook",
    "prc": "application/x-mobipocket-ebook",
    "fb2": "application/x-fictionbook+xml",
    "djvu": "image/vnd.djvu",
    "djv": "image/vnd.djvu",
    "xps": "application/vnd.ms-xpsdocument",
    "oxps": "application/oxps",
    "pub": "application/x-mspublisher",
    "vsd": "application/vnd.visio",
    "vsdx": "application/vnd.ms-visio.drawing",
    "mpp": "application/vnd.ms-project",
    "one": "application/onenote",
    "wps": "application/vnd.ms-works",
    "dot": "application/msword",
    "xlt": "application/vnd.ms-excel",
    "pot": "application/vnd.ms-powerpoint",
    "pps": "application/vnd.ms-powerpoint",
    "docm": "application/vnd.ms-word.document.macroenabled.12",
    "xlsm": "application/vnd.ms-excel.sheet.macroenabled.12",
    "pptm": "application/vnd.ms-powerpoint.presentation.macroenabled.12",
    "dotx": "application/vnd.openxmlformats-officedocument.wordprocessingml.template",
    "xltx": "application/vnd.openxmlformats-officedocument.spreadsheetml.template",
    "potx": "application/vnd.openxmlformats-officedocument.presentationml.template",
    "odg": "application/vnd.oasis.opendocument.graphics",
    "odc": "application/vnd.oasis.opendocument.chart",
    "odf": "application/vnd.oasis.opendocument.formula",
    "odb": "application/vnd.oasis.opendocument.database",
    "odi": "application/vnd.oasis.opendocument.image",
    "odm": "application/vnd.oasis.opendocument.text-master",
    "ott": "application/vnd.oasis.opendocument.text-template",
    "ots": "application/vnd.oasis.opendocument.spreadsheet-template",
    "otp": "application/vnd.oasis.opendocument.presentation-template",
    "sxw": "application/vnd.sun.xml.writer",
    "sxc": "application/vnd.sun.xml.calc",
    "sxi": "application/vnd.sun.xml.impress",
    "hwp": "application/x-hwp",
    "cbz": "application/vnd.comicbook+zip",
    "cbr": "application/vnd.comicbook-rar",
    # images
    "jfif": "image/jpeg",
    "jpe": "image/jpeg",
    "jp2": "image/jp2",
    "jpx": "image/jpx",
    "jxl": "image/jxl",
    "apng": "image/apng",
    "svgz": "image/svg+xml",
    "xbm": "image/x-xbitmap",
    "xpm": "image/x-xpixmap",
    "pbm": "image/x-portable-bitmap",
    "pgm": "image/x-portable-graymap",
    "ppm": "image/x-portable-pixmap",
    "pnm": "image/x-portable-anymap",
    "tga": "image/x-tga",
    "pcx": "image/vnd.zbrush.pcx",
    "psd": "image/vnd.adobe.photoshop",
    "ai": "application/postscript",
    "emf": "image/emf",
    "wmf": "image/wmf",
    "dng": "image/x-adobe-dng",
    "cr2": "image/x-canon-cr2",
    "nef": "image/x-nikon-nef",
    "arw": "image/x-sony-arw",
    "orf": "image/x-olympus-orf",
    "rw2": "image/x-panasonic-rw2",
    "raf": "image/x-fuji-raf",
    "dxf": "image/vnd.dxf",
    "dwg": "image/vnd.dwg",
    # audio
    "aac": "audio/aac",
    "aif": "audio/x-aiff",
    "aiff": "audio/x-aiff",
    "aifc": "audio/x-aiff",
    "au": "audio/basic",
    "snd": "audio/basic",
    "amr": "audio/amr",
    "ac3": "audio/ac3",
    "wma": "audio/x-ms-wma",
    "ra": "audio/x-pn-realaudio",
    "mp2": "audio/mpeg",
    "mpga": "audio/mpeg",
    "spx": "audio/speex",
    "weba": "audio/webm",
    "dsf": "audio/x-dsf",
    "dff": "audio/x-dff",
    "caf": "audio/x-caf",
    "ape": "audio/x-ape",
    "mpc": "audio/x-musepack",
    "m3u": "audio/x-mpegurl",
    "m3u8": "application/vnd.apple.mpegurl",
    "pls": "audio/x-scpls",
    "kar": "audio/midi",
    # video
    "mpg": "video/mpeg",
    "mpeg": "video/mpeg",
    "mpe": "video/mpeg",
    "m2v": "video/mpeg",
    "ts": "video/mp2t",
    "mts": "video/mp2t",
    "m2ts": "video/mp2t",
    "wmv": "video/x-ms-wmv",
    "asf": "video/x-ms-asf",
    "flv": "video/x-flv",
    "f4v": "video/x-f4v",
    "3gp": "video/3gpp",
    "3g2": "video/3gpp2",
    "rm": "application/vnd.rn-realmedia",
    "vob": "video/x-ms-vob",
    "dv": "video/x-dv",
    "mxf": "application/mxf",
    # archives / packages / installers
    "iso": "application/x-iso9660-image",
    "dmg": "application/x-apple-diskimage",
    "deb": "application/x-debian-package",
    "rpm": "application/x-rpm",
    "cpio": "application/x-cpio",
    "a": "application/x-archive",
    "ar": "application/x-archive",
    "lz": "application/x-lzip",
    "lzma": "application/x-lzma",
    "z": "application/x-compress",
    "tgz": "application/gzip",
    "tbz2": "application/x-bzip2",
    "txz": "application/x-xz",
    "arj": "application/x-arj",
    "lha": "application/x-lzh-compressed",
    "lzh": "application/x-lzh-compressed",
    "sit": "application/x-stuffit",
    "msi": "application/x-ms-installer",
    "xpi": "application/x-xpinstall",
    "crx": "application/x-chrome-extension",
    "torrent": "application/x-bittorrent",
    "kmz": "application/vnd.google-earth.kmz",
    # certificates / crypto
    "crt": "application/pkix-cert",
    "cer": "application/pkix-cert",
    "der": "application/pkix-cert",
    "pem": "application/x-pem-file",
    "p12": "application/x-pkcs12",
    "pfx": "application/x-pkcs12",
    "p7s": "application/pkcs7-signature",
    "p7m": "application/pkcs7-mime",
    "csr": "application/pkcs10",
    "sig": "application/pgp-signature",
    "gpg": "application/pgp-encrypted",
    # scientific / data / databases
    "parquet": "application/vnd.apache.parquet",
    "sqlite": "application/vnd.sqlite3",
    "sqlite3": "application/vnd.sqlite3",
    "mdb": "application/x-msaccess",
    "h5": "application/x-hdf5",
    "hdf": "application/x-hdf",
    "nc": "application/x-netcdf",
    "fits": "application/fits",
    "dcm": "application/dicom",
    "pcap": "application/vnd.tcpdump.pcap",
    "pcapng": "application/x-pcapng",
    "sav": "application/x-spss-sav",
    "dta": "application/x-stata-dta",
    "mat": "application/x-matlab-data",
    # 3d / geo models
    "stl": "model/stl",
    "obj": "model/obj",
    "mtl": "model/mtl",
    "gltf": "model/gltf+json",
    "glb": "model/gltf-binary",
    "ply": "application/x-ply",
    "shp": "application/x-shapefile",
    # java / android / runtime artifacts
    "class": "application/java-vm",
    "dex": "application/x-dex",
    "ear": "application/java-archive",
}


def clean_content_type(header: Column) -> Column:
    """'text/HTML; charset=utf-8' → 'text/html' (MimeUtil.cleanMimeType)."""
    return F.lower(F.trim(F.split_part(header, F.lit(";"), F.lit(1))))


def url_extension(url: Column | str) -> Column:
    """Lower-cased extension of the URL path ('' when none)."""
    u = F.col(url) if isinstance(url, str) else url
    path = F.regexp_extract(u, r"^[a-zA-Z+.-]+://[^/?#]+([^?#]*)", 1)
    return F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]{1,8})$", 1))


def detect_mime(
    url: Column | str,
    content: Column | str | None = None,
    content_type: Column | str | None = None,
) -> Column:
    """Best-effort MIME type: magic bytes → Content-Type header → extension
    → application/octet-stream. ``content`` may be a BINARY or STRING column."""
    expr: Column | None = None

    def chain(c: Column, nxt: Column) -> Column:
        return F.coalesce(c, nxt) if c is not None else nxt

    # a non-empty cleaned header of a *textual* family vetoes the weak 2-byte
    # magics below (a CSV that happens to start with 'BM' or 'MZ' must stay
    # text — Tika's magic entries for those carry a higher-priority text
    # detector; the column form encodes the same precedence as a veto)
    header_is_text = F.lit(False)
    if content_type is not None:
        _h = F.col(content_type) if isinstance(content_type, str) else content_type
        _cleaned0 = clean_content_type(_h)
        header_is_text = F.coalesce(
            _cleaned0.startswith("text/")
            | _cleaned0.isin(
                "application/json", "application/xml", "application/javascript"
            ),
            F.lit(False),
        )

    if content is not None:
        c = F.col(content) if isinstance(content, str) else content
        head_hex = F.upper(F.hex(F.substring(c.cast("binary"), 1, 16)))
        ext0 = url_extension(url)
        # container refinements FIRST so they outrank the generic magics:
        # RIFF form types (byte 8), ISO-BMFF ftyp brands (bytes 4/8), and
        # zip refined by extension (OOXML/ODF/jar/epub/apk)
        magic = None
        for sub, mime in _RIFF_SUBTYPES:
            cond = head_hex.startswith("52494646") & (
                F.substring(head_hex, 17, 8) == sub
            )
            magic = F.when(cond, mime) if magic is None else magic.when(cond, mime)
        is_ftyp = F.substring(head_hex, 9, 8) == "66747970"
        # ONE map literal + try_element_at instead of a 22-branch CASE
        # (the round-14 _EXT lesson: chained whens dominate Catalyst
        # analysis + codegen at this width)
        brand_map = F.create_map(
            *[F.lit(x) for b, m in _FTYP_BRANDS for x in (b, m)]
        )
        magic = magic.when(
            is_ftyp,
            F.coalesce(
                F.try_element_at(brand_map, F.substring(head_hex, 17, 8)),
                F.lit("video/mp4"),  # unrecognized brand default
            ),
        )
        bin_head = F.substring(c.cast("binary"), 1, 65536)
        is_zip = head_hex.startswith("504B0304")
        # ODF / EPUB convention: first entry is named exactly "mimetype",
        # STORED (no compression, no extra field), so the package's real
        # mime starts verbatim at byte offset 38 — take it AS the answer
        # (covers every ODF flavor incl. templates, epub, and anything
        # else using the convention, with zero per-type table entries)
        stored_mime = F.regexp_extract(
            F.substring(c.cast("binary"), 39, 100).cast("string"),
            r"^(application/[a-z0-9.+-]+)",
            1,
        )
        magic = magic.when(
            is_zip
            & (F.substring(c.cast("binary"), 31, 8) == F.lit(b"mimetype"))
            & (stored_mime != ""),
            stored_mime,
        )
        # OOXML: [Content_Types].xml leads the package; the main document
        # part name (a long needle — compressed-byte collisions are
        # vanishingly unlikely) pins the flavor by CONTENT, so a mislabeled
        # .zip URL still detects as docx/xlsx/pptx like Tika does
        is_ooxml = is_zip & F.contains(
            bin_head, F.lit(b"[Content_Types].xml")
        )
        for part, mime in _OOXML_NEEDLES:
            magic = magic.when(
                is_ooxml & F.contains(bin_head, F.lit(part.encode())), mime
            )
        zip_ext_map = F.create_map(
            *[F.lit(x) for e, m in _ZIP_EXT.items() for x in (e, m)]
        )
        magic = magic.when(
            is_zip,
            F.coalesce(
                F.try_element_at(zip_ext_map, ext0),
                F.lit("application/zip"),
            ),
        )
        # OLE2 subtypes by directory-entry name (UTF-16LE needles over the
        # head window, the POIFSContainerDetector names); extension refines
        # when the directory sits past the window; generic x-ole-storage
        # is the floor
        is_ole = head_hex.startswith("D0CF11E0A1B11AE1")
        for name_, mime in _OLE_NEEDLES:
            magic = magic.when(
                is_ole
                & F.contains(bin_head, F.lit(name_.encode("utf-16-le"))),
                mime,
            )
        ole_ext_map = F.create_map(
            *[F.lit(x) for e, m in _OLE_EXT.items() for x in (e, m)]
        )
        magic = magic.when(
            is_ole,
            F.coalesce(
                F.try_element_at(ole_ext_map, ext0),
                F.lit("application/x-ole-storage"),
            ),
        )
        # EBML: the DocType string separates Matroska from WebM (same magic)
        magic = magic.when(
            head_hex.startswith("1A45DFA3")
            & F.contains(bin_head, F.lit(b"matroska")),
            "video/x-matroska",
        )
        # IFF FORM container (r16): form type at byte 8 — AIFF/AIFC
        magic = magic.when(
            head_hex.startswith("464F524D")
            & F.substring(head_hex, 17, 8).isin("41494646", "41494643"),
            "audio/x-aiff",
        )
        # ASF GUID shares audio (wma) and video (wmv/asf): ext refines,
        # the generic video/x-ms-asf prefix entry is the floor
        magic = magic.when(
            head_hex.startswith("3026B2758E66CF11") & (ext0 == "wma"),
            "audio/x-ms-wma",
        ).when(
            head_hex.startswith("3026B2758E66CF11") & (ext0 == "wmv"),
            "video/x-ms-wmv",
        )
        # Unix ar: '!<arch>\n' — a leading debian-binary member makes it
        # a .deb package (Tika's ArDetector + deb refinement)
        is_ar = head_hex.startswith("213C617263683E0A")
        magic = magic.when(
            is_ar & F.contains(bin_head, F.lit(b"debian-binary")),
            "application/x-debian-package",
        ).when(is_ar, "application/x-archive")
        # --- offset-anchored magics (r16): the published signatures that
        # do NOT lead the file; each is anchored at its spec offset so no
        # contains() scan can false-positive ---
        def bin_at(off: int, n: int) -> Column:  # 1-based byte offset
            return F.upper(F.hex(F.substring(c.cast("binary"), off, n)))
        # ISO9660: 'CD001' follows the volume-descriptor type byte at
        # sector 16 (byte offset 32769); checked early because hybrid
        # images may open with MBR/ELF bytes
        magic = magic.when(
            bin_at(32770, 5) == "4344303031", "application/x-iso9660-image"
        )
        # DICOM: 128-byte preamble then 'DICM'
        magic = magic.when(bin_at(129, 4) == "4449434D", "application/dicom")
        # MobiPocket/Kindle: PDB type/creator 'BOOKMOBI' at offset 60
        magic = magic.when(
            bin_at(61, 8) == "424F4F4B4D4F4249",
            "application/x-mobipocket-ebook",
        )
        # MS Access: 'Standard Jet DB' / 'Standard ACE DB' at offset 4
        magic = magic.when(
            F.substring(c.cast("binary"), 5, 15).isin(
                F.lit(b"Standard Jet DB"), F.lit(b"Standard ACE DB")
            ),
            "application/x-msaccess",
        )
        # EOT: magic 0x504C at offset 34 plus a known version dword at
        # offset 8 (0x00010000 / 0x00020001 / 0x00020002, little-endian)
        magic = magic.when(
            (bin_at(35, 2) == "4C50")
            & bin_at(9, 4).isin("00000100", "01000200", "02000200"),
            "application/vnd.ms-fontobject",
        )
        # ICO: reserved 0, type 1, then a plausible LE image count
        magic = magic.when(
            head_hex.startswith("00000100")
            & (F.substring(head_hex, 9, 2) != "00")
            & (F.substring(head_hex, 11, 2) == "00"),
            "image/x-icon",
        )
        # Type 1 PFB: segment header 0x80 0x01 wrapping a PostScript font
        magic = magic.when(
            head_hex.startswith("8001")
            & F.contains(bin_head, F.lit(b"%!PS-AdobeFont")),
            "application/x-font-type1",
        )
        # Leading-magic lookup, LENGTH-BUCKETED (r16): one constant map
        # per distinct prefix length, probed longest-first, replaces the
        # former 60-branch when-chain — table width now costs map entries
        # (data), not codegen branches (the d6_mime_adaptive lesson), and
        # longer = more specific encodes priority (RAR5 over RAR4, the
        # PFA needle over bare '%!PS-').
        by_len: dict[int, list[tuple[str, str]]] = {}
        for prefix, mime in _MAGIC_HEX:
            by_len.setdefault(len(prefix), []).append((prefix, mime))
        prefix_hit = F.coalesce(
            *[
                F.try_element_at(
                    F.create_map(
                        *[F.lit(x) for p, m in by_len[L] for x in (p, m)]
                    ),
                    F.substring(head_hex, 1, L),
                )
                for L in sorted(by_len, reverse=True)
            ]
        )
        magic = magic.when(prefix_hit.isNotNull(), prefix_hit)
        # weak 2-byte magics need a stronger discriminator than the prefix:
        # BMP is confirmed by its zero reserved bytes at offset 6; bare 'MZ'
        # and an MP3 frame-sync yield to a textual Content-Type header
        magic = magic.when(
            head_hex.startswith("424D")
            & (F.substring(head_hex, 13, 8) == "00000000"),
            "image/bmp",
        )
        magic = magic.when(
            head_hex.startswith("4D5A") & ~header_is_text,
            "application/x-msdownload",
        ).when(head_hex.startswith("FFFB") & ~header_is_text, "audio/mpeg")
        # SWF: 'FWS'/'CWS'/'ZWS' + a sane version byte — the printable
        # 3-byte tags could open a text file, so both the version bound
        # and the textual-header veto gate them (Tika's swf magic)
        magic = magic.when(
            F.substring(head_hex, 1, 6).isin("465753", "435753", "5A5753")
            & (F.substring(head_hex, 7, 2) <= "28")
            & ~header_is_text,
            "application/x-shockwave-flash",
        )
        # textual magics on the string view
        s = F.ltrim(F.lower(c.cast("string")))
        # an XML-subtype header (application/xhtml+xml, image/svg+xml, ...)
        # is MORE specific than the generic '<?xml' magic — let it through
        # (TestMimeUtil.java xhtml vector)
        header_is_xmlish = F.lit(False)
        if content_type is not None:
            _h2 = (
                F.col(content_type) if isinstance(content_type, str) else content_type
            )
            header_is_xmlish = F.coalesce(
                clean_content_type(_h2).endswith("+xml"), F.lit(False)
            )
        magic = magic.when(
            s.startswith("<!doctype html") | s.startswith("<html"), "text/html"
        ).when(s.startswith("<?xml") & ~header_is_xmlish, "application/xml")
        # mbox: the classic "From " separator opening the file (Tika's
        # MBoxFileTypeDetector reads the same 5 bytes, case-sensitive)
        magic = magic.when(
            F.substring(c.cast("string"), 1, 5) == "From ", "application/mbox"
        )
        # NUTCH-2606 (TestMimeUtil.java text/plain vector): a server claiming
        # a binary format whose magic did NOT match, over content that sniffs
        # as plain ASCII text, is lying — Tika's text detector wins. Lowest
        # magic priority: every real magic above already had its chance.
        if content_type is not None:
            _h3 = (
                F.col(content_type) if isinstance(content_type, str) else content_type
            )
            header_claims_magic_binary = F.coalesce(
                clean_content_type(_h3).isin(
                    "application/msword",
                    "application/vnd.ms-excel",
                    "application/vnd.ms-powerpoint",
                    "application/pdf",
                    "application/zip",
                    "application/gzip",
                    "application/x-ole-storage",
                    "image/png",
                    "image/jpeg",
                    "image/gif",
                )
                | clean_content_type(_h3).startswith(
                    "application/vnd.openxmlformats-officedocument"
                ),
                F.lit(False),
            )
            looks_text = (F.length(s) > 0) & F.substring(s, 1, 512).rlike(
                r"^[\t\n\r\x20-\x7e]*$"
            )
            magic = magic.when(
                header_claims_magic_binary & looks_text, "text/plain"
            )
        expr = chain(expr, magic)

    if content_type is not None:
        h = F.col(content_type) if isinstance(content_type, str) else content_type
        cleaned = clean_content_type(h)
        expr = chain(expr, F.when(cleaned != "", cleaned))

    ext = url_extension(url)
    # ONE constant map literal instead of a 300-branch CASE chain: the
    # widened glob table made the chained-when form dominate Catalyst
    # analysis + whole-stage codegen (a fixed multi-second per-query cost,
    # measured on j3_index_fields); try_element_at over a literal map is a
    # single expression (NULL for unknown extensions, ANSI-safe)
    ext_map = F.create_map(
        *[F.lit(x) for e, mime in _EXT.items() for x in (e, mime)]
    )
    expr = chain(expr, F.try_element_at(ext_map, ext))
    return F.coalesce(expr, F.lit("application/octet-stream"))


# SpellCheckedMetadata (metadata/SpellCheckedMetadata.java:40-107): HTTP
# header names seen in the wild are misspelled ("ContentType",
# "content_typ"); the reference canonicalizes against the known-header set
# by stripping non-alphanumerics + case, then a small-distance match.
_KNOWN_HEADERS = (
    "Content-Type",
    "Content-Length",
    "Content-Encoding",
    "Content-Language",
    "Content-Disposition",
    "Content-Location",
    "Content-MD5",
    "Last-Modified",
    "Location",
)
_HEADER_CANON = {
    "".join(ch for ch in h.lower() if ch.isalnum()): h for h in _KNOWN_HEADERS
}


def spellcheck_header_name(name: str) -> str:
    """Canonical header name for a possibly-misspelled one — driver/parser
    side helper (SpellCheckedMetadata.getNormalizedName): 'ContentType',
    'content-type', 'Content_Typ e' all resolve to 'Content-Type'; unknown
    names pass through unchanged."""
    if not name:
        return name
    key = "".join(ch for ch in name.lower() if ch.isalnum())
    if key in _HEADER_CANON:
        return _HEADER_CANON[key]
    # one-typo tolerance on the normalized form (the reference's small
    # Levenshtein threshold): single char missing/extra/substituted
    for k, canon in _HEADER_CANON.items():
        if abs(len(k) - len(key)) <= 1:
            # cheap edit-distance<=1 check without an import
            if len(k) == len(key):
                diffs = sum(a != b for a, b in zip(k, key))
                if diffs <= 1:
                    return canon
            else:
                longer, shorter = (k, key) if len(k) > len(key) else (key, k)
                for i in range(len(longer)):
                    if longer[:i] + longer[i + 1:] == shorter:
                        return canon
    return name
