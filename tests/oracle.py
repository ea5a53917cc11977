"""Build/load an extern-C shim around the reference static library.

Ground truth for format-compatibility tests.  Lives entirely in /tmp; the
repo never contains reference code.  Returns None when /root/reference or a
compiler is unavailable (tests skip).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

REF = Path("/root/reference")
BUILD = Path("/tmp/refbuild")
ORACLE_DIR = Path("/tmp/oracle")
ORACLE_SO = ORACLE_DIR / "oracle.so"

SHIM = r"""
#include <cstdint>
extern "C" int bsc_init(int features);
extern "C" int bsc_compress(const unsigned char*, unsigned char*, int, int, int, int, int, int);
extern "C" int bsc_decompress(const unsigned char*, int, unsigned char*, int, int);
extern "C" int bsc_store(const unsigned char*, unsigned char*, int, int);
extern "C" int bsc_block_info(const unsigned char*, int, int*, int*, int);
extern "C" int bsc_bwt_encode(unsigned char*, int, unsigned char*, int*, int);
extern "C" int bsc_bwt_decode(unsigned char*, int, int, unsigned char, int*, int);
extern "C" int bsc_st_encode(unsigned char*, int, int, int);
extern "C" int bsc_st_decode(unsigned char*, int, int, int, int);
extern "C" int bsc_lzp_compress(const unsigned char*, unsigned char*, int, int, int, int);
extern "C" int bsc_lzp_decompress(const unsigned char*, unsigned char*, int, int, int, int);
extern "C" int bsc_coder_compress(const unsigned char*, unsigned char*, int, int, int);
extern "C" int bsc_coder_decompress(const unsigned char*, unsigned char*, int, int);
extern "C" int bsc_qlfc_static_encode_block(const unsigned char*, unsigned char*, int, int);
extern "C" int bsc_qlfc_static_decode_block(const unsigned char*, unsigned char*);
extern "C" int bsc_qlfc_adaptive_encode_block(const unsigned char*, unsigned char*, int, int);
extern "C" int bsc_qlfc_adaptive_decode_block(const unsigned char*, unsigned char*);
extern "C" int bsc_qlfc_fast_encode_block(const unsigned char*, unsigned char*, int, int);
extern "C" int bsc_qlfc_fast_decode_block(const unsigned char*, unsigned char*);
extern "C" int bsc_detect_segments(const unsigned char*, int, int*, int, int);
extern "C" int bsc_detect_contextsorder(const unsigned char*, int, int);
extern "C" int bsc_detect_recordsize(const unsigned char*, int, int);

extern "C" {
int o_init(int f){ return bsc_init(f); }
int o_compress(const unsigned char* i, unsigned char* o, int n, int hs, int ml, int bs, int c, int f){ return bsc_compress(i,o,n,hs,ml,bs,c,f); }
int o_decompress(const unsigned char* i, int is, unsigned char* o, int os, int f){ return bsc_decompress(i,is,o,os,f); }
int o_store(const unsigned char* i, unsigned char* o, int n, int f){ return bsc_store(i,o,n,f); }
int o_block_info(const unsigned char* h, int hs, int* pb, int* pd, int f){ return bsc_block_info(h,hs,pb,pd,f); }
int o_bwt_encode(unsigned char* T, int n, unsigned char* ni, int* I, int f){ return bsc_bwt_encode(T,n,ni,I,f); }
int o_bwt_decode(unsigned char* T, int n, int idx, int ni, int* I, int f){ return bsc_bwt_decode(T,n,idx,(unsigned char)ni,I,f); }
int o_st_encode(unsigned char* T, int n, int k, int f){ return bsc_st_encode(T,n,k,f); }
int o_st_decode(unsigned char* T, int n, int k, int idx, int f){ return bsc_st_decode(T,n,k,idx,f); }
int o_lzp_compress(const unsigned char* i, unsigned char* o, int n, int hs, int ml, int f){ return bsc_lzp_compress(i,o,n,hs,ml,f); }
int o_lzp_decompress(const unsigned char* i, unsigned char* o, int n, int hs, int ml, int f){ return bsc_lzp_decompress(i,o,n,hs,ml,f); }
int o_coder_compress(const unsigned char* i, unsigned char* o, int n, int c, int f){ return bsc_coder_compress(i,o,n,c,f); }
int o_coder_decompress(const unsigned char* i, unsigned char* o, int c, int f){ return bsc_coder_decompress(i,o,c,f); }
int o_qlfc_encode(const unsigned char* i, unsigned char* o, int is, int os, int kind){
  if (kind==1) return bsc_qlfc_static_encode_block(i,o,is,os);
  if (kind==2) return bsc_qlfc_adaptive_encode_block(i,o,is,os);
  return bsc_qlfc_fast_encode_block(i,o,is,os);
}
int o_qlfc_decode(const unsigned char* i, unsigned char* o, int kind){
  if (kind==1) return bsc_qlfc_static_decode_block(i,o);
  if (kind==2) return bsc_qlfc_adaptive_decode_block(i,o);
  return bsc_qlfc_fast_decode_block(i,o);
}
int o_detect_segments(const unsigned char* i, int n, int* out, int maxseg, int f){ return bsc_detect_segments(i,n,out,maxseg,f); }
int o_detect_contextsorder(const unsigned char* i, int n, int f){ return bsc_detect_contextsorder(i,n,f); }
int o_detect_recordsize(const unsigned char* i, int n, int f){ return bsc_detect_recordsize(i,n,f); }
}
"""

CFLAGS = (
    "-g -Wall -fPIC -D_LARGEFILE64_SOURCE -D_FILE_OFFSET_BITS=64 -O3 "
    "-fomit-frame-pointer -fstrict-aliasing -ffast-math -mavx2 -fopenmp "
    "-DLIBBSC_OPENMP_SUPPORT -DLIBSAIS_OPENMP -DNDEBUG "
    "-DLIBBSC_SORT_TRANSFORM_SUPPORT -DLIBBSC_ALLOW_UNALIGNED_ACCESS"
)


def load_oracle():
    if ORACLE_SO.exists():
        o = ctypes.CDLL(str(ORACLE_SO))
        o.o_init(0)
        return o
    if not REF.exists():
        return None
    try:
        if not (BUILD / "libbsc.a").exists():
            subprocess.run(["cp", "-r", str(REF), str(BUILD)], check=True)
            subprocess.run(
                ["make", "CC=g++", f"CFLAGS={CFLAGS}", "-j4"],
                cwd=BUILD, check=True, capture_output=True,
            )
        ORACLE_DIR.mkdir(exist_ok=True)
        shim = ORACLE_DIR / "shim.cc"
        shim.write_text(SHIM)
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-fopenmp", str(shim),
             "-o", str(ORACLE_SO), f"-L{BUILD}", "-lbsc"],
            check=True, capture_output=True,
        )
        o = ctypes.CDLL(str(ORACLE_SO))
        o.o_init(0)
        return o
    except Exception:
        return None


def bsc_binary():
    """Path to the reference CLI binary, or None."""
    p = BUILD / "bsc"
    if p.exists():
        return str(p)
    if load_oracle() is not None and p.exists():
        return str(p)
    return None
