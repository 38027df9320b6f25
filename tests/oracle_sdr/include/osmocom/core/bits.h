/* Minimal libosmocore bits.h stand-in for compiling the reference SDR
 * layer (/root/reference/src/sdr/) into a parity oracle.  Only the two
 * typedefs the SDR code uses (reference pi4cxpsk.c:37, dkab.c includes
 * it transitively via pi4cxpsk.h). */
#ifndef ORACLE_OSMO_CORE_BITS_H
#define ORACLE_OSMO_CORE_BITS_H

#include <stdint.h>

typedef uint8_t ubit_t;  /* unpacked bit: 0 or 1 */
typedef int8_t sbit_t;   /* soft bit: -127..127, sign = bit value */
typedef uint8_t pbit_t;  /* packed bits, MSB first */

#endif
