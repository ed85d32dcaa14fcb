"""EXTERNAL golden JPEG fixtures — GENERATED, do not edit.

Produced by scripts/gen_jpeg_golden.py using the JDK's
javax.imageio JPEG codec (an implementation independent of
fourmc_spark.operators.jpeg): `jpeg_b85` are JPEG bytes the
JDK ENCODER emitted, `pixels_b85` the RGB array the JDK
DECODER produced for those same bytes. A complementary bug
pair in our encoder+decoder cannot cancel against these.
"""

import base64
import zlib


def _unpack(s: str) -> bytes:
    return zlib.decompress(base64.b85decode(s))


FIXTURES = [
    dict(
        name='gray_gradient_16x24', w=24, h=16, gray=True, quality=0.9, progressive=False,
        jdk_vs_source_maxdiff=1,
        jpeg_b85=(
    "c-s4a<NpH&0WUXCHwH!~1_nkTWcYuZ!I^=Xi3x;&fCY$HIapa)SXjB(+1WUFxOjNDxwy"
    "G``Gf>``2_j6xdp@o1cgOJMMZh|#U;c<B!omnMgAXP;O1ZuV31&B6lC~+gh3u?I4dI<F"
    "hBt#6VPBbb`DN1ZlHp#0t`%y%*;$I%pj|Pvb8{Y1{Oh9Aw@$+HsQcTcBMiQqsEB~Ih36"
    "?9uy6__(8=usi=vQOH5osQc6`#T|-mL#MI2(!qUpw#nsK-!_zA`Bs45MA~GsDB{eNQBQ"
    "vYGq_nKOqOz*FrM0cSqqA$$<SA39O`kDy)}qBrmM&YqV&$q$o40J;wtdIWU55@IIeP5)"
    "iIb-;UA}Vl+VvYZZ#{hU_{q~}&tJTJ_3_i^FJHfX|MBzJ|62?kAph7i{K!6J&;RfFyZ;"
    "Pc-_~>dvHv}P_h0Q>f0RG`XLwil{>ys%5B-P#Gwl4m|I*&|SXBPM2>?8BjYR"
),
        pixels_b85=(
    "c-lSE_bUW&7{~GZK`Dv|kz|I1v(DbKIeVVH_c;5^bJp2gwzJ0>>BvkMp%ZmV`N1FKQ%`"
    ";WgU|c*JRA;3LqkJLOG{T**TBHQ#Kgqh+}zsQ+TPyY(b3V(&CScp%irHWBqSs<GBP$cH"
    "Zd_VH8nLmJ3Bu=zoew3va+(izP_ocNmEl(TU%RCPtVB6$kf!-!otGV*4Dwnfy?E(ySw}"
    "N_yh(9hJ}SiMMd%X{N&{1jEoF{Ku}m%SXNe6U0vPK(9qi2DiVowbaeFf^^J{<&CJZKtg"
    "P(p?3|pOTwPr~Jw1JWeS?F8!^6X4Vqy{!5-=k(GczwQuc)Y~qN1X<wpJ(<wzai&cXx}$"
    "VnahiYO%4gL5s7qGiIPAARquO5fKq_adBu#OH0EHw3L>XQcH7lb9;MxPfw3TA{ibY#tc"
    "hKOU!_Vi;D|p`1$z-1qES7baXUYXhv>sZgFvOd3iZzG&VM(rK_u}udi=#aBysFY-(zXW"
    "}t<UhK7b>21wC@8H}{5s;aK84y4r5-`|fJ<KyGAv$Knfiy%ddhld9v#f<p)c#x*2r|0D"
    "4FjCBDX=wo|S_TFNq*CeR<mBAk-174B`uaLZc|0Ck7%5#gD=Ujy7%4Q+0#a(3o}OM<SX"
    "fzE+1lFL-QD%}_NErR2S}5WlIXGp1qIYXq#Yd{y}i949T^#+mZhbowY4>wOm=W^aB^}2"
    "QfdKdN=gd5EJ&#Zq@A6eARQVS8XX-4DYa~DZ0zjp93CE?ot<4?UV@Zb7%5#Aq}0MlCnh"
    "FlW@bQ2Eqi-=$H&L#=jRHA;^yWCq|^dZv=Av;KuRqjMGKLl1*B-%-`|(Z<rfzhS65f}_"
    "xDdvPnZExv_OMM*=0dWmjx+itgfzZZf;`6(a{lFXvX8?<MZ?L+uIxaQbx)yiy3HPq}$u"
    "um;q9>V8-3u9cH||yr@*FudgqVqNS#$hLO@`L5i07`FTc)8K<YGAici6et39LDwVIVuO"
    "A;DYPI_3=Le+J!bs_|AjNy2g^@x7Ew{I~)bjrR{`vX&{r&y>`}_Cz_YdsV?+^"
),
    ),
    dict(
        name='gray_noise_17x13', w=13, h=17, gray=True, quality=0.7, progressive=False,
        jdk_vs_source_maxdiff=32,
        jpeg_b85=(
    "c-jHt0UiGT*#F=F5K2Z#MgRc<000310RRC1+W<oV3I_)W2L=iV2nY)b3JVSx5DpCu4jm"
    "O15f~#MB_tvrA|WO#H!mhBG$|n>FhMaiIXgZ+J|!+hNkcqHH$6T(|G)qX2mlcP4FLfW0"
    "RO}Q9{>OW1pxs80RaI300000000010s{mE1_uZU3Jd?l0JRVR0s#X90t5pE1q1{D00Dg"
    "g0s{a95d{(<F+m0sQDFxnaTGFvk)a49Lb1UWQqk}vGh%Xr2?`b$7#SKRCMPH<Dl|1VH#"
    "j*uLqtVJM@UIZQ&d$}S6EqEV`OD!XJ~0^b98lfcX)YvgM@{Khlq)al9QB`mY0~Bnxdnm"
    "rKYE-sj9NGw6(UkxVgH*!^FkL$H>Xb($mz{*4NnC+Tr5k<mKk)=;`Y5^7Hid_V@Vt`v2"
    "Mh2mt{A06ze!p<Y8`8Y$Z5?n4kV+!Kg6kVu<zwMiRgmm~r{Z@q#I?M}x~ySrtE<L!{!l"
    "L|N5BVC(LHnY5JUB>{P1_GR%oEC<_{LGDWthf61j_AUQ;1*@xy$;L(KK3F#8A_b{xGyy"
    "2ju;uVY!(V8zjaBY&Q*rofa4@OjseC1&1BF203#NS{{UW){{ZO}RRz!dgDk(`f6Q0^*~"
    "FEz+W"
),
        pixels_b85=(
    "c-jq;KS+X66vf3B5sK6jF-SDXNJJXUG$9QWAp}K{FeHZpa|#Vg$SLx32~ki}%p_9$H%K"
    "H%R2m4jR8Uw$N=wmT4K<h$VrThy?{V(AzkBXS5X9){=*!Csm&>i!>+N=XczF2c=B84q{"
    "QmyN<MBiyVX;_DCX?N6UtL}8@9!TP8v6M7*xcN_zP_f@=@36ZKZnC%f*?pF5{*WK;PUd"
    ")<M9-W#rOC3y}iBt{e7KIcXV__rBX*mM)-XG?(VL^V7R@#-P+pv`ubX1Tf4Zp`1|`ao6"
    "TyqTCdk%U0p#27?{^;HHk!m@^ZPH$z)DWP6B~|OeVuS1l4MFV`Bq8fWa)d0>kZggW>b@"
    "^X=`8$K$zNuBD|VFi%WO3=9l_0WV-aJUr}nyO=8$i@`si&x=H&_4Rcq=jZ2Jt=8b+AjV"
    "{~*>Iblo;DhdjYb2p<Z`(}p+F{+AzoNmK)Ylz`SkQOHa4bEC{n2uMn;C9-QM1|*=&o8i"
    "yDmv<%p5NV63dHKq(Xo#bWWy%nYJKZb(C`)gpvwG#ZISn$70i+#J5Zn4O&k|K#K(tiHd"
    "$Pft(p?(RUIPNyFp9$sHxVRe3fjwGS%>+3`7QmF)tUaz;jybMU}7m*?vbjK{vd%a%dj2"
    "+<}RVYF7!C-J|Y6_4n77GhHJ3DhaoiIUbpU=l+GLa0fp-{;0_jfv-<Ktt2K!9~*vssjk"
    "kB=*r%KQ6!i~}CD!1>_d06*B{<0FT|fy2+w54K>nT5+aOC_6hlh)61xs#Ge6!-1<@F8>"
    "F@Dn8Z"
),
    ),
    dict(
        name='rgb_constant_16x16', w=16, h=16, gray=False, quality=0.9, progressive=False,
        jdk_vs_source_maxdiff=1,
        jpeg_b85=(
    "c-s4a<NpH&0WUXCHwH!~1_nkTWcYuZ!I^=Xi3x;&fCY$HIapa)SXjB(+1WUFxOjNDxwy"
    "G``Gf>``2_j6xdp@o1cgOJMMZh|#U;c<B!omnML>oyG6VInuyV4pa*FVB^NNrR{vTiv<"
    "X{kB5MX9hVqg+vWEN!ne}q9E=uTEfFkpZJMkb&e+1NQaxwwG}whAyXF)}kVu`q*N4V0|"
    "~$}_MCvI;30I<g4|CbBCPiWoIcT*#s9wDF*5(8Uib#z{p@oLpk!5|UD?YU&!AS|+Au<`"
    "$M#&MvNQ?jD|A!6Bhx;SrHh$tkI6=^2?>#U-U><rS4x%`L5M?H!$6lO|7@I&J!lnX?ux"
    "Ub1xA@)avrZQ8tL>$dGXcJ4ZK_{h;?$4{I*b?NeztJkjIxOwa0qsLF4K70P+<*SdMK7a"
    "Z8?fZ|Pzd-(CWMF250j&NK1p14Kg@u`g9po=YrgD%1K^9g;LpCADK=#B!VI`wR4iTq`3"
    "pXC*R5lL!AevNkkxNX)<e}<Ekk`OIBhF(@Wcdv4F@(QvG4L=m0wa%Ekinke{Gu-H56Yi"
    "D|Gx<UH;u(!"
),
        pixels_b85=(
    "c-jkCpdK)aM$t$`08kAV5C"
),
    ),
    dict(
        name='rgb_gradient_32x24', w=24, h=32, gray=False, quality=0.9, progressive=False,
        jdk_vs_source_maxdiff=4,
        jpeg_b85=(
    "c-s4a<NpH&0WUXCHwH!~1_nkTWcYuZ!I^=Xi3x;&fCY$HIapa)SXjB(+1WUFxOjNDxwy"
    "G``Gf>``2_j6xdp@o1cgOJMMZh|#U;c<B!omnML>oyG6VInuyV4pa*FVB^NNrR{vTiv<"
    "X})>kYHw1Vqg+vWEN!ne}q9E=uTEfFkpZJMkb&e+1NQaxwwG}whAyXF)}kVu`q*N4V0|"
    "~$}_MCvI;30I<g4|CbBCPiWoIcT*#s9wDF*5(8Uib#z{p@oLpk!5|UD?YU&!AS|+Au<`"
    "$M#&MvNQ?jD|A!6Bhx;SrHh$tkI6=^2?>#U-U><rS4x%`L5M?H!$6lO|7@I&J!lnX?ux"
    "Ub1xA@)avrZQ8tL>$dGXcJ4ZK_{h;?$4{I*b?NeztJkjIxOwa0qsLF4K70P+<*SdMK7a"
    "Z8?fZ|Pzd-(CWMF250j&NK1p14Kg@u`g9po=YrgD%1K^9g;LpCADK=#B!VI`wR4iTq`3"
    "pXC*R5lL!AevNkkxNX)<e}<Ekk`OIBhF(@Wcdv4F@(QvG4L=m0wa%Ekinke&-DvAb?-%"
    "A?Beae`)KD{w&U+U#`P|^@%Ntg)`#b8uIt}-UJ6nm67CEV)L1i@`O_M|_}|ADKAHv6u~"
    "*u0<L^D;reGZxw@AzHK3eO&pgtgNXWcJZz2@Za6^nMsf(&&{`tbZ|#G3uz`<?&a1OQRQ"
    "1k3"
),
        pixels_b85=(
    "c-jTQ30K+(0svrx-~n2&h6+dl2}&qIASj1KO*jH3AORC3T;T{p5V=G|vA(u*wA0Q#J3B"
    "kGZ+GABFWv8302UVHi-2-j_CmR^xh~UhESO#bkQT7(0Aw3L&4Ay!5Z+zDVIYnGlpA1t3"
    "m1nnKD1E9fX3-UC%SMGlZ_HGnQT!Zmn&D~nzcpn#iHS*-27@0dL@Sqi->U%wJiD}8Me1"
    "byphLUa>^rT4&-b=&L7EzlSPqOlw$HeDIX=}GR4x;%Cc&0S)*P7UoIQK74z1T&9Dr=UU"
    "pelP}@qtzKp$Dj_j|H?o|q1VS-ES(Q*-65l)xH$WoVF9Z;*I)av50YDuY5t*>b|R9aAF"
    "*iu=xRl7!&V`t4}T|;-*1CBKeQAOPAq;H+}uQ4GNhpiRyHGxoxq*6+(_vsho^A~_pqgd"
    "ZiZfMk?8r;$twlyY`1~PBhZ5zn$2I|-dAR5fA!O;!Uzd?mG8BD{TYKl=!HKuN!X(U>6b"
    "N+Ia-2~RP3bl51Q>%FeY7L;?s5S3sAxLYtZz3@0MZn-bi21a{!7K6zq>i*1T+0$5Pilo"
    "EDAHi(T-(oWjW4!j8(WGEopQ^d(QkpT^#-%fysLwD^{`WiIQ6Jo7x3!Bhq_2mM`Aka#K"
    "1&#TwKqe8HAKx%xp<H{UEO&=M4a8RBRcQ2BXGg1b4O#R-+j<LXOw){<h0)^rG8AzYz-="
    "iKEvfzD?oA3~6K&ulcl5INuht+tP)xUoee}uYoO-!eCLEEb1N0rp;p5vzVM_2(dU&GlE"
    ")Bzc~;xhcR>H#FB_v=-3WJSvcClGnQJ;B68+#-ZCif+*YiB(JD7Wt5!&3vu^HL4Gze>4"
    "?%7ld|-3=A@7kba13EML=ZMI0i}`<LqqI2RLVgDXB7)piMREI-EqwZnD-PGyK>L2w%fr"
    "sb^~HJdG~Cn-4WbFf-rjG2;eXl-HXKG1ZAgbn910=oW01w0&f?~d)<nC&~)624%yBdh0"
    "Uq7BWkA;+;{5TPV=GD=6Av&rwc<++!csAG4c(OaFS_+K6f!WCwGAq3(i{6DOR1`x^o~R"
    "<F*U1?JMlwRi{V2zYlsndY{J>^jJe)_}Jq-^?0KmKj{vic?cRMvu-NuWjHUJ_wXfmt>O"
    "_I`%=@}Z=)m0E8Fua9EYpOf!gB(eLlVa&~$VN9Ut291B5t4;|GD{L6|<k&ky6d1ByGy6"
    "nrdyP^|cb8Y(t@-S%O>;~!o7WsZQt8C1GMYF_|64C+Hc^Kk$=3Br+(D<1MDLxEHX%LIv"
    "Bh|GuR%TT5m<SL<}5Ue!<tyVzl1P8sN@!$wRFohdiMKQG>14CgwhM8~-A}~0HAqfnnvA"
    "}s4%Z73GI9@oWidd$Cu~n?tz=T#<>|jz4>km#w<71iUM1h_v{kZ0c0FO`gIAM;RKqL-R"
    "xQoWU=R_cfW85iGz{xUB3pi6F*alv@A_VDF?43vhqJJA1PYJ*mRrq7dqnP?Q3gS^+G-^"
    "sjAu0;fG2}ds=3)UZf)%28DMku0su5?z7%Rq#ov3gfZT6$mIDT_Sj%IOLfLuCCDv!_9L"
    "=uc8^ogYTEMcXSa3+c5l4w2|;1gJxB!n}vc}9y#rj_J6XT@Gp7$n7UvO7)oAE@zDQWm5"
    "X;k5EJt&XI?IBhsfnNlezorbe1<RXP$ru;=3tI&~pnrx-1c8ZbGTsO@R(zQ`qoTQ}t^k"
    "9BIe$D{ljQp5cC35OG117UNnlWV<E0cxUEON<si`hVx!RibyX30*Ll5&||j=jn8w~R2!"
    "Ht#diW48aC8^6yjoUrm!P8ny_B)dsp=u@mI$67D)@Fj;7IB$jX3v9T_5m#Ki%Tc|2X2`"
    "Nbj-PVEj1}js^u+Z)<VPR!K;%*p<yB|An&LMz1wF%?@&)L!02d3c5|7r4{zf6(z9c#Yv"
    "d`0lB6G{LlOq4XSLX%sxzK&b-+WUVeOm<LB?Vblrb_B`X){+cuqD%F87fxbY8k0kykgn"
    "kDuugcqE{iuWolf_Ov~JTg?}mw&n5AFN&33d|5O=$SCJ)!C90;%)YRD;$O-z(nyDn%ss"
    "daWT#Y)~5du;z+!rFl8hKZvr*-DB#y-~hcQxU?Abu@$Kh*}`*T>)20lJ|`iOO6<ebL-3"
    "Gz`V2snUc55f+<BtBH2S;7ubuY!bI(;$Ea4TA8;Z_bl>XiM4MU;^(IHMI8Lpy8T&{Wv-"
    "T(wkqG&T(-gTmA=w8*RO1iE4bZubvkIj6Bx9yNjoxaCm!1LQ-^uiX5UNvx1HK|?bZ)h-"
    "JhhvZ_@ZTNtW#@F0PfAJx%FaTfNrTuPv=E)Vg*^*REa<9oz(Nd)Tx~JoFN8d#UFh^Hq="
    "ix>x$t6TV!FKX#>Gdi~$~<3IWUJ5*ebl%=7%Isoefy*M;=hLAM0_eRKIh~AF;(?R%QM7"
    "$lv-;JpEBj)3f{W#*k468p5n!gOC-$(sF$D==Qf&4^XxKoxVYGDjECi<&8b9Z9x-NF5d"
    "Yc%mrCc)VRn@{lPDfwYaeRG%jbjN;~7Js-Cex8WGO*((S>;H8>`qvcT?-k{lvNlsU@4>"
    "5?zI$)JzK8k`j`0kcJfO3O;L|MpJR?3lB)*+dpB|XckL(Y#;?Ix5-)7<;_tIap!M`8J|"
    "9x02Jt``5RsBiRnrl0A!}Z*9^Jp8)9k=uS>7(yq9(?<F{O&RG)jaX>DfRh@`SQg5_*D9"
    "JUi*D6{^POx&-vg#Pq+X3KY4apcK"
),
    ),
    dict(
        name='rgb_texture_19x21', w=21, h=19, gray=False, quality=0.5, progressive=False,
        jdk_vs_source_maxdiff=31,
        jpeg_b85=(
    "c-s4a<NpH&0WUXCHwH!~1_nkTWcYuZ!I?pTn}?5wOMs7;Pe@QeSVBWeLQG7;P+3)0!^+"
    "s!#?sir+`%Kp&%q_!)!ZT=H!wUtDLo_I&bP3#Af+NEH9Z+*2&15okc6m&zLb=HvXg~VG"
    "Rffo0R}-124MzKW=16jCP7AKLB{__803NOWMu>c1}I=;VrF4wW9Q)H;sz?%D!{<R$jr>"
    "d!pzFb!UB}71<Et92(k((8alEG2PU#B6^a-&PF%>L?6mQqXwbzED#l4gO`Kd};u4Zls%"
    "q*Qnp!5NX66=_R?aT2ZtfnQUcn)uVc`*xQOPN(Y3Ui6S;Zx#W#tu>Rn0A}ZS5VMU6UqH"
    "nL2IyjG40*Enc#8+42=DS8dw7W$U)>J9h3mboj{8W5-XNJay^vm8;jT-?(|};iJb-o<4"
    "j2;^nK4pFV&2`tAFVpT9u<Vq{=ugaNGn5(N5-iG_ukg&pKCMy7I*0znp5MME|r$3XVPL"
    "SZGNMh+3Di3>L#<Wx2e`XHKAbdgI;#pI#tN08URJ|oU!O=S5D?lFYFZZYsMGXf)zS&+e"
    "=;jz;B;M-ecdiu8d*)8tcDR}4JjRo9YJ7xQ?q;+MSWaz)%rLm#t&Y9+S&G**2*!g_FJ^"
    "xad#tWV;OIGP|N(Q=$gzP<1|NkZc9r6J9"
),
        pixels_b85=(
    "c-lQv*^Z)66nvYcjkbG>IBvANpn{+%h=8(OxIjx!W-|Z(BU5rSRtUj|I<=f*y<YEhI)l"
    "MrI2`^gFdmO*vzb&t6h*vuyPc+K=kxh;F(Mie>Uq)44eZO^Y&M%8A0ORrm*Y6h;d%b^^"
    "K-RYZ8jS=VY}TbigGv{7~Ql^SJwcSq(SnFHvgm1Xy6U{WHJG3Qvh69mQ_{Nb=@!w%Q7w"
    "7ux}>letZwJ;Qjr*TCLV<HPB%L=0RU97K{$t`~4o$r_%{^sQcl~C+?lNx6pC?>)YE~xm"
    ">Q->oAW7#sx;B(JM8hLmlP~<8=2OOdzozWrRNBQmIs_RA3vrNIjiS!R_^WFtA>)VF1C="
    "+wpkR3;3ZIMqZqR*@Hg5(?)?-s|AW62%tk9qws+V@W2dc1yBMZK@^3QMl_A_fQ87Qqju"
    "~L!QlZ0@W%RJfHl7_fDhMo?{}9FlBP7zbCkw*$AAs8AqWmFD580=P#v=4r{{S=5D*fFV"
    "d(oIoVVL;^wuo^Gwf`T8gwYK{#o;AAc|-lCwM|saPygMth-mB-|xdVQo}R2kj4qY2}-+"
    "QZH95Z*f+=b?<DY|zzttl#}`0pC~!WXLlj)R@r?=4y*}aC)(!M0x1hhWcM80+v#p_d1O"
    "XlD_7g6RvNX;g^c$=5uK`Yu#b?#A<9XE%KpjJn-EkbKo9C-zd67qHkWw$fy|MUQ0r<z("
    "*!Ix?beGE|Y#=qXEz90YimsXWs}K4k%G<35*J<~7uGi)9^!r1c9(eee%|I8I>(y4?8JD"
    "N3aWP%oY>;G0{*`{GB<r-Qe5cXxehhp3_~&RM%%zpQSM=#*wO3D*=~9vv`JhOOh<}-OR"
    "(G<Nq<NY>Fy+tR-|bq7Z&!zWN5IVwgt@Q~mx{d8h4J!9pNreQs_5!Qlbq0&by?iWA<aU"
    "XTwE*uBK7hQu2~uNxY=kl7iP=JYQ2ypQ62QBs&<~Qw#wnC8An;)fi9^M%*0tvlGLzG{B"
    "8dMSFYFb"
),
    ),
    dict(
        name='gray_prog_29x37', w=37, h=29, gray=True, quality=0.85, progressive=True,
        jdk_vs_source_maxdiff=252,
        jpeg_b85=(
    "c-s4a<NpH&0WUXCHwH!~1_nkTWcYuZ!I^=TnT3UgnH5N|va+(V^Kh^O0Y4WvCyyY%kdP"
    "q1pn$NLjJU9fl&FB9grbC$jI6x8ys)^Eijtg)jGVmO|3eJi91OAys*H?+4F8WXNB~V{1"
    "{#h4EKJO-?Eh~ua4>>|8J~0Qd-43v6n9Gv7ehU-t@c1YG6G;dNZObfm<1VGgcOCL`WRW"
    "6*1TDh1BC7^A!Z?E%%2u+I{GrgURzq*T1#5@lErz&4Ksgza5)?MF}uzQXrzt+0|PS~D-"
    "#<t%t%HiK_MkW$G}8Ir=+5V%7wy4K@%r^XxwxWY6Y7;llGR=+x_p~SQo5!*Zf)52dfRI"
    "w_Sgh^`qp`q}z$>jl)kZI{RP;>*=VTyo+5Ay!Gzd=dBmLm2eKE_G8Sl*lkjuO=}E7eOA"
    "A`TzxG2ibnTp(=^ATYm23~B<&VCz1{cctUckG)AMHE1Df<|RcimV>wD7HH*fUJ-Ei&Wt"
    "gl=OWn#HTI~cBPU2*KK{7Jq`e=_CkUOx$W`{$C~-&@8mne%Qey6y01*=M)H$SBX%8S+!"
    "^WgJ!fW2oXTQz$T@eTlnhZ-_6@<B9?dOpL%FXM_hPqo5)K(BFj<6B`#k+z1O$d&SH<pZ"
    "C4}xi3~lr<(Ci?FtWe!ISf|-v&Ngr=EYSW^Tm1d5N3KXY092h}kQ@EB{=j%OJ#gqW1h&"
    "juRZ78)tvpZ6%~LvxtA@-&HenRZYIn)(e%}r1r0WEB9}k-p}T57HDodsW)BwclZw(@$G"
    "MGSD*g&;8xDgkamHx8FRM99pAmi=CFRr-BUmBy<1eE<RWn=X8qK+TJe%6=ANGVdGE@9k"
    "DvZ$sN{-<ry7AN&i_HFO9_}#m_PuYRv^Ah3~VesIC0^{4{+}Zv@{9b)C_z1TIc6>{ZA7"
    "gUEgNm%&Fz((wpzT|L_@SMrMb&jdIJobw0SLyr^muDXvnAy)n1rig&MsSN4{-3w&2qo|"
    "bOZ^)fwQU>oURF}cO|UGOi#KC4iP2!o&e$vu}7G+K0gX7Omf^YRp%;!#rJzjLx`md-B!"
    "+(Wj(dYNu&cKI{14?Z-|l2jEEVES|C`2mFhB}Jj^B>NkNdw(aa?*7v#@=TjG<jMXWynZ"
    "ZA%qH65ujI>=_FU3@6ZyR}U;Y100O^QoPy"
),
        pixels_b85=(
    "c-l?ZRS1?_69r(q69fxXj@{VZiHeGW-Q9_G?C$RF?(P=B4&>NifT)*x<CXsd126y0Vwk"
    "<Z*|YY{Uh{tW^5sjBBE>)d`~!35%n5Vl%9S>4+ES%TvCEb%n<h<~diCnDD^;oln>B03)"
    "1W~EcGs?5VZ(+EQ>RYdq)C%lh3(t7=NUhKJi9}O4sg(*L9kb^ULwz#Ge?A}Q>XGQTC^x"
    "-%9INiE@ZD+v&OGhuU^fbIdi6++qZ9rJ9qBnIdI?rJb3V+{U=VG2pb+gd>G!ndl#NLa|"
    "T|yas|G6^$KRso*fn`QY1m_VBNZPomHVi1$O1im0^t<H8N$&)TmLTurp@N7+gAb><D}J"
    "?wu}Ox}igdvitPu!|v9tn>}ove*OBvv17-=1q&9WN|kEHj2UdmUb}WJd-LYa5F`0-*sy"
    "`Ud-v|dzjf<Y`5ZlZl)Yoe4tq9j+Jt*B3N8;HK6EY*eDvs%Jz273;V)XWC_5@xpg;jwy"
    "?S+6wQ5xns#K}MhBE2Ysgs*;-MY01O`A65A2@Je)QDd-F>2SYU9gr<|Ni|U?&2(7yx1P"
    ">tj?M>%ZWVMvSnMkbZL0Rx0*R~=2fd!X{6wSJOBFi>+RpOXOB4h_wSE;5bgN!<LuL?Pq"
    "Sf$3>j|TyvcL_{(YD`cW%GUlP3?maN)ut6e?7R-Mo48s8RHu-$n)XWb|RytXaEv?=D)G"
    "E?s!~_U-H3Aw!0+hYcHMXQ2Lcfo!J?A3hvn#6M-qltBFu>~txVx%-Je+_-V0{n3G!FJG"
    "3My2!+;Q^IrU(j^{Mv**Hv3-0{JjT`LGpFdm0ON4?23-aX6o7ZZI5+&Hhix*GcTB}yAq"
    "Cf4&lwGS<Eiv1+Z5yu)4jw!h4j3>%w2>o6Iz70I8a2w!>C>n4Oqejip850V!)@EPxs4@"
    "DmP8exdL^%E-@bj$I(F<Bd&`zB;smd=XV3CPO}#ibbM4wSHw>*}$N&8KbNJ!Ihp3&q(t"
    "-9so@&*qLA@uYZuF~i<;uyebm`Le=rQNwBDc<+JKLk0Q9-|I(V~UbP!b($b@JrNZ2f7^"
    "iWMvTYTmqgJY&X;NuNGFPp}hT?W_iO^_BUNBS%CFozZnrALhuBBUqd|bxK#feEE|7<jE"
    "6f-MMpz9Uiq)sZbS}JF85YGXMYLV8x0R`Ae2889gaNC<(=Y`Vcm5+}Qm@C%0+SMn0oQk"
    "B%27+ldn=@~a@k)N#QsSkTE(iKu3DX6U5X7pv>mtrHDX_Z)htf?g{|&U*a#G0&SfZ{WL"
    "k?-GT1_UswdhjK1ozC5HYBGU@d^j=H^ejaDlu3g)0s2wiB4j0_<@+%&{3V(13J@Fn@4H"
    "q`elwnMYUAuP4jgt5+n?K$i^?)l^u7u~$pNAJOUW6x4o|K7hbh_@9Nlbyjr%#{C<i(2@"
    "PWkxpqiAp6zO_Gp{`^+4gEec`v<j0Nsh6ERa_G^c2M;BQHx=EL%rd<Eih9U-+O%nK(xg"
    "dtsvX<?+Y@t5{&r%d_m(YN7S(}XS?Hn6dF%;oId|@y9H@tAG2N)W)vH&pvTxtM?e-o#c"
    "wiMr`1R}8q(AG|ub)hTu!|Kd=C|s?HplfgzjLEwgCm{cH^pQUwV)WXjfqB8<YQ{H6SYq"
    "!IK_~IRln7f@g74VMF_RuyLT_Ve*L;k)Xtt@>h<wNPvRv4<p2Ktd$5N8{r4aI^XE@YI#"
    "{Pp9jF7bh^n=0*%InT(P#xbls|cEvQ-^+)G;_(jecW~8#hk0nA)L-iDLLIE@nzhy_nag"
    "vl&M#l76G@PV~yKa3^~5(4j;8@zz55%>o(H5ca1}pWx4*KjHiL??WMVZ1T!Piy5sta#K"
    "4oLl1*Ryet*8$|JX^m!6cv+_`g;4#Y?;)XUD<vuEQ%C1R$BGQ@Waq>7>Wq4Vtc*3y&W>"
    "p-`G5r1%xu6zCZHT?GNTd0aXYRdlg>lgg;<qHo+@#3O7$pnvYOPZg2EBeX`J%nD9dkD2"
    "3F=9kA@6-$863QT-(DP6~UmEcRm7wn{7&FdXbCcAAee2dOcOEY*a*iqX<Hrw3Jw%3y-&"
    "^xiqCbEC{tf^B{Tp-5efsvmRDZhdm<4*$S)r5hwQPRb)3ayK_^QM%Y`w=%=bf0aa~57Q"
    "k8j|Z*OVk`DsxPOkvNd8UgCsK-n(}%-ksIxK&xI~FbcJg4y2Is4}aW4R5MmFqV^O+WE`"
    "Cv-;nWNAm&#nj4%A8QobbZq4|maFJHdg&UjhAuk_)+|NiS-U;9x<k+J(9^sX{N"
),
    ),
    dict(
        name='rgb_prog_32x40', w=40, h=32, gray=False, quality=0.8, progressive=True,
        jdk_vs_source_maxdiff=5,
        jpeg_b85=(
    "c-s4a<NpH&0WUXCHwH!~1_nkTWcYuZ!I^=Lg_Vt!g^i7sjh&s1gG+#mi<6T}gpZ#`KwL"
    "yZLR>^lOiET&UP@Y7ModgWM?qOlT~kX_QeM|USHnP6LsJ7}2qQZ?I~NC+Fc+7whLo6;2"
    "Fc+6AqGJX1_cHUW=16jCP7AKLB{__7$g`Nm>GfYL;@_V%<MoJNk#@{AVdO8%&d$o?Eh~"
    "u@GvtnFbOaV0R8w}G<<c_y;WbsB^xgmRh|uf_4do%SL;IqBV?Jvfrf|)pc(--1!w{X&`"
    "w5HrdgANvV1*PnyM|ig3j~@IZhD6am*}CieUXf346wx$Is2}-Ot$-7k>d+Cdi1Unvp>e"
    "te6R;*i&bcw?0srhyWv+lN_KfVzXyb$E$$RUQsm^2*P230QQ~0s)md;{6LN3Aorr`R5T"
    "2PJ6B+pR!?eRNU}Y4w+b-8-6}BUswMW&Q#6D-MW9QmW03|n;{QzmCn|iE"
),
        pixels_b85=(
    "c-jrYi#r+$!vOGHvYq3y4Rd5}8|9HqB==^yW>JQia*4{)Ws#Cxs-c>Sn6fEtaw{{Jvz4"
    "7;J99rH=bU9G=lu@v^L(6_{T1)~`vCv|fUAqM`(-C@4}iZXAml0l><fVUxy1OpAa1y%1"
    "i9S3>69A=z(qI{qMV4govYzaG=wuF5zv?l5TF1eG@v^Z(39=lo9F!Wo{O%)W%RzwRI$@"
    "+ne*Fnz<ZMOC$iIKjq@(e`AfaaH@4H?jjpFW*K+~T$r%U)x_SKQ=I!MQy6PJ03k3TCq5"
    "f|0fJ^Z~Kct5KfDU)d1q1O=U}-dv2){&*1JaN{W-_o5<swXX5oZErIY0&GQh)v>ZNX(7"
    "{_<$Co0;G?SMFvZ0pC{vS8H9jD3@*Y%XXIAA?MNw@6uWG4;MmD=gS^$KYIR;&o%b|ANS"
    "CoJRl&Cs2g6fL0-tvt7&0ZGa|h5BE9g@UZrqP62hw{(TkSi#Z2?y-u<yP<3~x3hb+%ii"
    "S-)5dua===!>oxOFgF_c+OXNE!KD})p)Ma+_&ql>@lzGbFLgUd7TKZo(ZphZ})Nj@w%J"
    "mb&o4P{{#BTClurp5$FpG@r%9XhYa&ijquBe^ut8^;$yB85WYm@b#k&VEzOUKzRu0`5$"
    "5_x@_eNQK1$s6{`-E~qMvl7{>Jj_rV79LYCkK*cZqs^jqbZ$e|?YbXK(a#@cmANerFv&"
    "U5Ek!9)Z9sf$lzm*RBWng91Ws1VVy?pf^Ke!h@0Ekd(-fyHP>8F@d<)pb}(Yc~VeSS|I"
    "gKFe5XNn;qDacSDQ~?8XQ76bAPdhYXek4?hSol7gqIg61ee7Fys^UC=5cXp<eh+Zg<XA"
    "ABebK5h#-6^ER6h6B99U9W-N{lM1(!u*57LPEpCZ-qyOfny>dh{%ZK=!o<fa1J7@02yA"
    "A5=KmgRHuhiGr}3!;SG7W1O>N5`0(zM@Fyh@bs6~SgNWhEh?mviDGGR&27X%~{tF}g6F"
    "Y2^1KDYU{3!r`YXkqE7;@SPIhRHOe4<?aU>-MM-a$~%O=w716c`)@g+#|dqvK(>Q{XXZ"
    "1S~fJR*)1$KtYLjqpLGuwCpHmUQ}Z~w52doTm+Mr!4wao`-#z-irYH!?a^A8sSY+rhgn"
    "!r@7b``2Iy8(^seBxy*>I+1pB))`cxi$p@?<%ivxn<+=F7hZ^He-@Q?^NI1&zpB4TbM;"
    "$z}d<KxkZh}_gTJSvWWh7&X5$T@M;+&CsSmRksKDTa$m;j;2rMFm1#h0s(ZbQHvB9m2$"
    "jons*^jd4rdxKF&;Ek4558gCcHJ38Z!rHIp>_zP8{6DZLwFwr9v=@W(oMIb{Xk&q~46f"
    "7wQo)jOOoSKl7k(`7<CF0W)2$_k*tRylfk%moV6((|vkSzqHq&!hdN>o%O^^=n{HOV?!"
    "@+dvg#7dZZlw@s6T;e6JHYaWhlWn48yCm7sopk&p=}eV!u0}cCKmmi(JZ`0VLsCG{l+f"
    "t32zXjlEGiax2bqwbnv{-CL*=ET@R=w=b}A8br#c@+E4afdN^2@j6B1J-6)0&nN<qG(r"
    "ry!e&^ku?80(ISgPLzbSp{j!Eq7MiP}}Y4Hc7g@8+G&qb)vX)+LwMYkmVGb?G~2h5s~Q"
    "=i4KTH--KsIATnX`*>OqP3CTHWsW}<xS$P>*g*n+}*h~^Or=~EAR+P;u%WNvoY^_8;uF"
    "jIxW+^Gz{SR}rbc~*zGsel8ZpvC{&RT5ETyD!=6J>2b&ap{z_T@Q8%A6B*?mwEGiy^Gj"
    "Evy^3zypf)xqUAHelIj03rV~OOUjQ;$w#7asp+_kjC@RXL1A8gX#tj0m`^Uj))DfV<yd"
    "ZIp0GMkLcz-Fuu3|vpM}%1ae5BU*pzSP=g$lCt?l=g#Mre?>{eHSO<u6C!Z~_zCr@!_L"
    "%8q5MF2<<Fp}U7EB1yLgW~RoCKQ2_i=iomm^4CsIw1vJnvq4w%`L&_mk<g|%8N?KrNy-"
    "J5+<prvAU?Grbt99mePwAj8gTZQVpk6*GL%U6HJ1Vxwc}9xaj@k;??frO?k;~55e9?I2"
    "<TF9x6T6m7N<%fJhP$MsmMRx)xXNpHLo>L;|M~Bkxqe(G>`ERZ3RXT}%b$UIh+UQBp)K"
    "Csb5FAW}&rW)+EBOKPbr7t@JS2C0W#+1F4p*i<>puN)PSrrJoe9Tk>N();d;)gIDDPvx"
    "$v@=Jfkp{C;adFB6)RQ=~=trLt2jG?$AYQ2$UP%=3*wHA_I8<jzg&7vZ+X{ot1G?s!Xp"
    "y2OQ2!vYV0}7c$p;l3ulv*yWR#;yvW>Tc=T15j@-9#H~t{ZNl8QUl(QSEFe#VV~`l2cb"
    "zl&xN>ZGiSgOLIJ<9qVbQFKOpvbf?=4U@XHOS?`ln2TH9ALD3=T`lu`hJcohIWv1pa(F"
    "OGwd_At1QTm{sL}HMu7_=G&lSb!0q_;5XVm4jMp)0sdHJ_<zX6f6Q#tw%0F=I|zZ<W)R"
    "dg@pE>bKMk+aT-9Gv?ti^Vq;T8)IEea-85CAcEtW!0}08gHY_yyBtU+2b$9W$21`G8dI"
    "^2XnX_aJ_ko=C@trZDjLXS4voTL(Ky_Cwvf#hbJ(&*wt~k|3mP;nTzv=EC~h!!J(`z3v"
    "i7i-m5<i?A8ijb?rIzC!wn8Y!?CgPY=V1X;ycChfyidhB)(4?FW@dOG=mSx=0h<pG54C"
    "0SYaBjC8MYrQ!KzgXf7r3Nmb3{T0V`&XFcR|nN30tSJKFn^LR>upubh1ZEMkYv=|>Zo4"
    "fe)a-LP$wA9C2d&=7$Y~Fj`Vjtl<UN)ah2+pPi-={lV5=6ixkq4^7H@z(&v+ZVfdjzIE"
    "3M+;eh>^I*Y4;_W1kt@RQ6WiGTHQ{n71hw%>*(z)R(sQ<)>dw-gx4+?w5eJ}10A9vk$6"
    "NR9_#LymUYZ4M2qV7rGbt$ZQJ&9(eHZk{!8)Exai*|(LXby?{iY;B&l1f%p<+qJF_bwy"
    "E8OT8j&xJ!pY%<Pmsm(RDwLCOqNHI;wz<unr<RhN`BZ)V@O$?uBN80R(_X6*d=T0QnpL"
    "`B{FTNRNpNdmrKox?uA~Nb)b7$BVBvmy{(t-8Dw^&>}XPUGA%osm0c{ToYGXl^gegA$~"
    "#--pQ{SSsvtNOv``H%QpXe2DP?MOxjMJ97gy6;LQxUxdaD^KDqF>BRB`!Ap+F&SQ^-0L"
    "3Q@1RvscsIr<19TJ-sHCYJQ;CqE#&o^{(oAw+wx|#=b9;eTUP1f6w-w&a2PgXaILKu4t"
    "`$j@BD92+AJ}!D+&aG?B&Hm{M(g*|TKQ(A`RHZjH8pqAj6oi1pfPwuaiEVep=E1y5Vr2"
    "E-kM($1$nokMD=c2NFoSgAGkYE1*0xxqopv#0NMnoowo&6h(v<3oR%G>0>qzvqWeEkhS"
    "pJs`v2nl<8)H{yfUf$+M}`+6`z4=pvo%MD24i<GLD88suh)Dc{rfxy%g9~sD8J*`R46z"
    "I6E!$Q$>i9{!p>Xb4={}Y2o`9jxcF!qm_HTt>ddh5vWl3`?ZRJS#5*fqVdzcw7skNo|{"
    "aQ4n{u{7qCJqE;#dE^^?@S~vO(GY?WTs{gVj>lAt$5&0JQpPiA<Cyw!9CMt&86!3r$-G"
    "gTz{qSfHi=#cAHNWHkIH&Rm5T9x)wrg2TsJUo)ELdrjdQv&>r3PE*y!qnacgqi_G;WdH"
    "{p0QalANwx-@aIVsgqex!p5);7mUEO(4Q#XxS8)GzG1gj;S&u$*)pruQDD^W0+<<+e~P"
    "jBJ!rlEt7RZ6H7G3lS~M^CMEJonQ~I8GWYkHwQ93|&^$I|GV7-1Uziq+lgks6Yg3b3)8"
    "@T7)Bc-j$D;Y<7xUT5tMgxHov^cRxLJ>)S?`h=(1V#!(kz5L7gaM4r_3X%3#s%4G;<Ea"
    "nZq}}Ch%uS&9BL=GqjG^?9SIs-LG1oypkwpWPLNr{@MPgv)aM=k>~Scy4PmI?7VSyaq{"
    ")@)a$jGncrT|*%s#ZEwe|z%$}^woqn3XShYA8THWqjJP8(`vbO=GH=$M52#OU(U5u?;O"
    "nCS%jrlI)(PAFgisvns2`!|y#TtpFPGV(C-}2-?w<&*q-1|m8@K!l!8PHmWh89Qki{l2"
    "%E2Cv$!m?<7yE1KApL_G$&(=Mwb^pEf=!50ozrOotWAXdevQyCtknq9t!Lo0~asYWbw0"
    "1dywj4$O2xojmGC!uWKW1`2V0a%2g&#}XR!E|in$G1q=?Y7}+@yTps(vpSSe9#+RL@oh"
    "bRUNFAN4O+#*8b|lS>Px73<8>^6c{3o2Biy%X{xW?60gie*JK=@!_AXkKaFU07^Do%Qo"
    "FBHoU9WLAC24)HTS%btq#qhP4^b-cI3cqj{UT%^Uc(%@Xkjv2%mmy-t&FFqLcE-nEv2P"
    "vXIK+0eRTcvC&Hp*3vkjGM;s4YO%&etO+9yS6mHzG_+De7CW?ylMZmak#p9vbAxxvvs~"
    "_1C-fZi8l8t+qK#qf9mHD`YwdI6Uq8LhO>ug{3C_;$KB?=+*TW|!&dTmr@Y%%E!&~??6"
    "UfHxlca}HJ`=Lcci)<h2ExqVbd7*bmM!Yrd`wY&fM&db>Z{U+uhZ7pEuv{?S9<*vSxE^"
    "*p7d*o!Wjs|6|{&;w!Lv-@Rtvn`Q?+{1U?a3VCFYYB+#%50LzCDS~fk;Q^-OEAH{vlJ0"
    "$?{A;yxpW648HDGVj{@MEMPl^7E%wSi%*zY&)YbU<yrVhqt?B>_@xrKe}Tl>=D{@T))?"
    "GImVt6%M#Umc(KkM|Bv|2R0eA39eZy45&5C=OrxH&FezQ1)R&!y%0OS8VfNNWoue!oM;"
    ")jxb^ezU!}2`4LHRRMU4@H*mxnJZyS)&^mk|F&xNW9;ikg{SyxD)RAG@F+S^<o<Cf8>s"
    "YiNto(AgzVhw2Uk~@z5BIknN4t)bKaT#f|Lgm~e*yP;b)x"
),
    ),
]


def load():
    import numpy as np
    out = []
    for fx in FIXTURES:
        jpeg = _unpack(fx['jpeg_b85'])
        px = np.frombuffer(_unpack(fx['pixels_b85']),
                           np.uint8)
        out.append((fx, jpeg,
                    px.reshape(fx['h'], fx['w'], 3)))
    return out
